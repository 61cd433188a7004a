"""Bounded crash reports + per-exception-class exit codes for build jobs.

Behavioral contract (observed from the reference CLI surface —
/root/reference/gordo/cli/cli.py:26-39's exit table and the reporter it
feeds; the exit-code ladder and 2 KiB budget are the spec, not the code
shape): when a build dies, an orchestrator needs

* a process **exit code** identifying the failure class without log
  parsing (data-too-small vs bad-config vs missing-file ...), resolved
  most-specific-type-first so a subclass never inherits its base's code;
* a small **JSON report** it can surface as the pod termination message.
  Kubernetes caps termination messages at ~2 KiB, so every field is
  budgeted: messages are clipped with a trailing ``...``, tracebacks
  keep their TAIL (the useful end) behind a leading ``...`` line, and
  non-ASCII characters are flattened to ``?``.

Report writing must never raise — a broken report would mask the build
failure it describes — so the file-writing entry point swallows and
prints its own errors.
"""

from __future__ import annotations

import json
import traceback
from enum import Enum
from typing import IO, Mapping

FALLBACK_EXIT_CODE = 1
_ELLIPSIS = "..."
_TAIL_MARKER = "...\n"


def ascii_scrub(text: str) -> str:
    """Flatten every non-ASCII character to ``?`` (one ``?`` per char)."""
    return text.encode("ascii", "replace").decode("ascii")


def clip_text(text: str, budget: int) -> str:
    """Clip to ``budget`` chars, marking the cut with a trailing ``...``.

    A budget too small to hold more than the marker itself yields "".
    """
    if len(text) <= budget:
        return text
    keep = budget - len(_ELLIPSIS)
    if keep <= len(_ELLIPSIS):
        return ""
    return text[:keep] + _ELLIPSIS


def clip_tail_lines(lines: list[str], budget: int) -> list[str]:
    """Keep whole trailing lines within ``budget``, head-marked ``...``.

    Tracebacks are most useful at the end (the raise site), so the cut
    discards the HEAD.  The marker line's own length counts against the
    budget.
    """
    if sum(len(ln) for ln in lines) <= budget:
        return lines
    room = budget - len(_TAIL_MARKER)
    kept: list[str] = []
    for line in reversed(lines):
        if len(line) > room:
            break
        kept.append(line)
        room -= len(line)
    kept.append(_TAIL_MARKER)
    kept.reverse()
    return kept


class ReportLevel(Enum):
    """Report verbosity ladder; each level includes the ones below it
    except that TRACEBACK replaces the message with the traceback."""

    EXIT_CODE = 0
    TYPE = 1
    MESSAGE = 2
    TRACEBACK = 3

    @classmethod
    def parse(cls, name: str, default: "ReportLevel | None" = None):
        try:
            return cls[name]
        except KeyError:
            return default


class ExceptionsReporter:
    """Maps exception classes to exit codes and writes budgeted reports.

    ``table`` maps exception types to exit codes.  Lookup walks the
    thrown type's MRO and takes the first class present in the table, so
    the most specific registered ancestor always wins regardless of
    registration order.
    """

    def __init__(
        self,
        table: Mapping[type[BaseException], int] | list | tuple,
        fallback_exit_code: int = FALLBACK_EXIT_CODE,
        traceback_depth: int | None = None,
    ):
        self.table: dict[type[BaseException], int] = dict(table)
        self.fallback_exit_code = fallback_exit_code
        self.traceback_depth = traceback_depth

    def _resolve(self, exc_type: type[BaseException]) -> type[BaseException] | None:
        for klass in exc_type.__mro__:
            if klass in self.table:
                return klass
        return None

    def exit_code_for(self, exc_type: type[BaseException] | None) -> int:
        """0 for no exception, the table's code for the most specific
        registered ancestor, else the fallback."""
        if exc_type is None:
            return 0
        match = self._resolve(exc_type)
        return self.fallback_exit_code if match is None else self.table[match]

    def _payload(self, level, exc_type, exc_value, exc_tb, budget) -> dict:
        if exc_type is None or exc_value is None or exc_tb is None:
            return {}
        if self._resolve(exc_type) is None:
            # unregistered exception classes get the bare {} report: the
            # exit code already says "unknown failure"
            return {}
        payload: dict = {}
        if level is not ReportLevel.EXIT_CODE:
            payload["type"] = ascii_scrub(exc_type.__name__)
        if level is ReportLevel.MESSAGE:
            message = ascii_scrub(str(exc_value))
            payload["message"] = (
                message if budget is None else clip_text(message, budget)
            )
        if level is ReportLevel.TRACEBACK:
            lines = [
                ascii_scrub(ln)
                for ln in traceback.format_exception(
                    exc_type, exc_value, exc_tb, limit=self.traceback_depth
                )
            ]
            if budget is not None:
                lines = clip_tail_lines(lines, budget)
            payload["traceback"] = "".join(lines)
        return payload

    def write_report(
        self,
        level: ReportLevel,
        exc_type,
        exc_value,
        exc_tb,
        sink: IO[str],
        max_message_len: int | None = None,
    ) -> None:
        """Serialize the report for ``sys.exc_info()``-style arguments."""
        json.dump(self._payload(level, exc_type, exc_value, exc_tb, max_message_len), sink)

    def write_report_safely(
        self,
        level: ReportLevel,
        exc_type,
        exc_value,
        exc_tb,
        path: str,
        max_message_len: int | None = None,
    ) -> None:
        """``write_report`` to ``path``; never raises."""
        try:
            with open(path, "w") as sink:
                self.write_report(level, exc_type, exc_value, exc_tb, sink, max_message_len)
        except Exception:  # pragma: no cover - reporting must never mask
            traceback.print_exc()


def default_reporter() -> ExceptionsReporter:
    """The build CLI's exit-code table (reference cli/cli.py:26-38,
    codes kept for the exception classes this package has)."""
    from gordo_spark.operators.filters import InsufficientDataError

    return ExceptionsReporter(
        {
            Exception: 1,
            ValueError: 2,
            PermissionError: 20,
            FileNotFoundError: 30,
            InsufficientDataError: 80,
            ImportError: 85,
        }
    )
