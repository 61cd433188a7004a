"""Exit-code mapping + bounded JSON exception reports for build pods.

Reference parity (/root/reference/gordo/cli/exceptions_reporter.py:12-221
and the exception→exit-code table cli/cli.py:26-38): a build failure is
reported as a small JSON document written where an orchestrator can read
it (k8s pod termination messages cap at ~2 KiB, hence the trimming), and
the process exits with a per-exception-type code so the workflow layer
can branch on failure class without parsing logs.

Faithful behaviors:

- ``ReportLevel`` EXIT_CODE/TYPE/MESSAGE/TRACEBACK verbosity ladder;
- exception table sorted so SUBCLASSES match before their bases
  (sort_exceptions's inheritance-count ordering);
- message/traceback trimmed to ``max_message_len`` with ``...`` markers,
  tracebacks keeping the LAST lines (the useful end of a traceback);
- non-ASCII replaced with ``?`` (termination messages are ASCII-hostile);
- ``safe_report`` never raises (a reporting failure must not mask the
  build failure).
"""

from __future__ import annotations

import json
import traceback
from collections import Counter
from collections.abc import Iterable
from enum import Enum

DEFAULT_EXIT_CODE = 1


def replace_all_non_ascii_chars(s: str, replacement: str = "?") -> str:
    return "".join(c if ord(c) < 128 else replacement for c in s)


class ReportLevel(Enum):
    EXIT_CODE = 0
    TYPE = 1
    MESSAGE = 2
    TRACEBACK = 3

    @classmethod
    def get_by_name(cls, name: str, default: "ReportLevel | None" = None):
        for level in cls:
            if name == level.name:
                return level
        return default

    @classmethod
    def get_names(cls) -> list[str]:
        return [level.name for level in cls]


class ExceptionsReporter:
    def __init__(
        self,
        exceptions: Iterable[tuple[type[Exception], int]],
        default_exit_code: int = DEFAULT_EXIT_CODE,
        traceback_limit: int | None = None,
    ):
        self.exceptions_items = self.sort_exceptions(exceptions)
        self.default_exit_code = default_exit_code
        self.traceback_limit = traceback_limit

    @staticmethod
    def sort_exceptions(
        exceptions: Iterable[tuple[type[Exception], int]]
    ) -> list[tuple[type[Exception], int]]:
        """Bases that are superclasses of more table entries sort LAST, so
        lookup hits the most specific matching type first."""
        exceptions = list(exceptions)
        inheritance_levels: Counter = Counter()
        for exc, _ in exceptions:
            for e, _ in exceptions:
                if e is not exc and issubclass(exc, e):
                    inheritance_levels[e] += 1

        def key(v):
            exc, exit_code = v
            return (inheritance_levels[exc], exit_code)

        return sorted(exceptions, key=key)

    @staticmethod
    def trim_message(message: str, max_length: int) -> str:
        if len(message) > max_length:
            message = message[: max_length - 3]
            return "" if len(message) <= 3 else message + "..."
        return message

    @staticmethod
    def trim_formatted_traceback(
        formatted_traceback: list[str], max_length: int
    ) -> list[str]:
        if sum(len(line) for line in formatted_traceback) <= max_length:
            return formatted_traceback
        length = 4
        result = []
        for line in reversed(formatted_traceback):
            length += len(line)
            if length > max_length:
                result.append("...\n")
                break
            result.append(line)
        return list(reversed(result))

    def found_exception_item(self, exc_type: type[BaseException]):
        for item in self.exceptions_items:
            if issubclass(exc_type, item[0]):
                return item
        return None

    def exception_exit_code(self, exc_type: type[BaseException] | None) -> int:
        if exc_type is None:
            return 0
        item = self.found_exception_item(exc_type)
        return item[1] if item is not None else self.default_exit_code

    def report(
        self,
        level: ReportLevel,
        exc_type,
        exc_value,
        exc_traceback,
        report_file,
        max_message_len: int | None = None,
    ) -> None:
        report: dict = {}
        if exc_type is not None and exc_value is not None and exc_traceback is not None:
            if self.found_exception_item(exc_type) is not None:
                if level in (
                    ReportLevel.MESSAGE,
                    ReportLevel.TYPE,
                    ReportLevel.TRACEBACK,
                ):
                    report["type"] = replace_all_non_ascii_chars(exc_type.__name__)
                if level == ReportLevel.MESSAGE:
                    report["message"] = replace_all_non_ascii_chars(str(exc_value))
                    if max_message_len is not None:
                        report["message"] = self.trim_message(
                            report["message"], max_message_len
                        )
                elif level == ReportLevel.TRACEBACK:
                    formatted = traceback.format_exception(
                        exc_type, exc_value, exc_traceback, limit=self.traceback_limit
                    )
                    formatted = [replace_all_non_ascii_chars(v) for v in formatted]
                    if max_message_len is not None:
                        formatted = self.trim_formatted_traceback(
                            formatted, max_message_len
                        )
                    report["traceback"] = "".join(formatted)
        json.dump(report, report_file)

    def safe_report(
        self,
        level: ReportLevel,
        exc_type,
        exc_value,
        exc_traceback,
        report_file_path: str,
        max_message_len: int | None = None,
    ) -> None:
        try:
            with open(report_file_path, "w") as report_file:
                self.report(
                    level, exc_type, exc_value, exc_traceback, report_file,
                    max_message_len,
                )
        except Exception:  # pragma: no cover - reporting must never mask
            traceback.print_exc()


def default_reporter() -> ExceptionsReporter:
    """The build CLI's exception table (cli/cli.py:26-38 adapted to this
    package's exception set; codes preserved where the type exists)."""
    from gordo_spark.operators.filters import InsufficientDataError

    return ExceptionsReporter(
        (
            (Exception, 1),
            (ValueError, 2),
            (PermissionError, 20),
            (FileNotFoundError, 30),
            (InsufficientDataError, 80),
            (ImportError, 85),
        )
    )
