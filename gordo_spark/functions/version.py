"""Deployment-tag grammar for the workflow surface.

``generate_workflow(version=...)`` stamps a canonicalized deployment tag
into the build-plan spec so malformed tags fail at generation time, not
at deploy time.  The *grammar* (behavioral spec, observed from the
reference's workflow generator — /root/reference/gordo/util/version.py
is the behavioral contract, not the implementation model) accepts four
tag families, tried in this order:

1. channel aliases  — ``latest`` | ``stable``
2. pull-request tags — ``pr-<decimal>``
3. releases          — ``<major>[.<minor>[.<patch>][<suffix>]]`` where
   major has at most 5 digits and a suffix (``rc1``, ``+build``, ...)
   may only follow a minor component
4. commit ids        — 8..40 chars of ``[0-9a-z]``

Anything else raises ``ValueError``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

#: channel aliases resolved before any pattern matching
CHANNELS = ("latest", "stable")

PR_PREFIX = "pr-"

# <major>[.<minor>[.<patch>][suffix]] — suffix only valid once a minor
# exists ("1rc1" is NOT a release; it falls through and fails as a tag).
_RELEASE = re.compile(
    r"(?P<major>\d{1,5})"
    r"(?:\.(?P<minor>\d+)(?:\.(?P<patch>\d+))?(?P<suffix>.*))?\Z"
)

# short-to-full git object names, lowercase hex-ish
_COMMIT = re.compile(r"[0-9a-z]{8,40}\Z")


@dataclass(frozen=True)
class ChannelTag:
    """A floating alias such as ``latest`` that tracks a moving target."""

    channel: str

    def tag(self) -> str:
        return self.channel


@dataclass(frozen=True)
class PullRequestTag:
    """A ``pr-<n>`` preview build."""

    number: int

    def tag(self) -> str:
        return f"{PR_PREFIX}{self.number}"


@dataclass(frozen=True)
class ReleaseTag:
    """A semver-ish release, pinned to major/minor/patch precision.

    ``suffix`` is the raw trailing text (``"rc1"``); empty when absent.
    """

    major: int
    minor: int | None = None
    patch: int | None = None
    suffix: str = ""

    @property
    def precision(self) -> str:
        """How many numeric parts the tag pins: 'major'|'minor'|'patch'.

        A suffixed tag always counts as full-precision ('patch'): it
        names one concrete artifact, never a floating series.
        """
        if self.suffix or self.patch is not None:
            return "patch"
        if self.minor is not None:
            return "minor"
        return "major"

    def tag(self) -> str:
        parts = [self.major, self.minor, self.patch]
        return ".".join(str(p) for p in parts if p is not None) + self.suffix


@dataclass(frozen=True)
class CommitTag:
    """A bare commit id (8..40 lowercase hex-ish chars)."""

    commit: str

    def tag(self) -> str:
        return self.commit


DeployTag = ChannelTag | PullRequestTag | ReleaseTag | CommitTag


def _try_channel(text: str) -> ChannelTag | None:
    return ChannelTag(text) if text in CHANNELS else None


def _try_pr(text: str) -> PullRequestTag | None:
    if not text.startswith(PR_PREFIX):
        return None
    digits = text[len(PR_PREFIX):]
    if not digits.isdigit():
        raise ValueError(f"malformed pull-request tag {text!r}")
    return PullRequestTag(int(digits))


def _try_release(text: str) -> ReleaseTag | None:
    m = _RELEASE.match(text)
    if m is None:
        return None
    g = m.groupdict()
    return ReleaseTag(
        major=int(g["major"]),
        minor=int(g["minor"]) if g["minor"] else None,
        patch=int(g["patch"]) if g["patch"] else None,
        suffix=g["suffix"] or "",
    )


def _try_commit(text: str) -> CommitTag | None:
    return CommitTag(text) if _COMMIT.match(text) else None


def parse_version(text: str) -> DeployTag:
    """Classify a deployment tag, raising ``ValueError`` if malformed.

    >>> parse_version("2.3.5")
    ReleaseTag(major=2, minor=3, patch=5, suffix='')
    >>> parse_version("2.3").precision
    'minor'
    >>> parse_version("1.2.3rc1").suffix
    'rc1'
    >>> parse_version("latest")
    ChannelTag(channel='latest')
    >>> parse_version("pr-42").tag()
    'pr-42'
    >>> parse_version("abcdef1234")
    CommitTag(commit='abcdef1234')
    """
    for matcher in (_try_channel, _try_pr, _try_release, _try_commit):
        found = matcher(text)
        if found is not None:
            return found
    raise ValueError(f"malformed deployment tag {text!r}")
