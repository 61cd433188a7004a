"""Version-tag parsing (reference /root/reference/gordo/util/version.py:1-130).

The reference uses these to validate and route docker image tags in the
workflow generator (release / latest|stable / pr-N / bare SHA). Pure
logic, reproduced for the workflow surface: ``generate_workflow`` stamps
a parsed version into the build-plan spec so a deployment can pin a
release the same way the reference pins image tags.
"""

from __future__ import annotations

import re
from abc import ABCMeta, abstractmethod
from dataclasses import dataclass
from enum import Enum


class Version(metaclass=ABCMeta):
    @abstractmethod
    def get_version(self): ...


class Special(Enum):
    LATEST = "latest"
    STABLE = "stable"

    @classmethod
    def find(cls, version: str) -> "Special | None":
        for special in cls:
            if special.value == version:
                return special
        return None


@dataclass(frozen=True)
class GordoSpecial(Version):
    special: Special

    def get_version(self):
        return self.special.value


release_re = re.compile(r"^(\d{1,5})(\.(\d+)((\.(\d+))?(.*?)?)?)?$")


@dataclass(frozen=True)
class GordoRelease(Version):
    major: int
    minor: int | None = None
    patch: int | None = None
    suffix: str | None = None

    def without_patch(self) -> bool:
        return self.suffix is None and self.patch is None

    def only_major_minor(self) -> bool:
        return self.major is not None and self.minor is not None and self.without_patch()

    def only_major(self) -> bool:
        return self.major is not None and self.minor is None and self.without_patch()

    def get_version(self):
        version = str(self.major)
        if self.minor is not None:
            version += "." + str(self.minor)
        if self.patch is not None:
            version += "." + str(self.patch)
        if self.suffix is not None:
            version += self.suffix
        return version


pr_prefix = "pr-"


@dataclass(frozen=True)
class GordoPR(Version):
    number: int

    def get_version(self):
        return "%s%d" % (pr_prefix, self.number)


sha_re = re.compile(r"^[0-9a-z]{8,40}$")


@dataclass(frozen=True)
class GordoSHA(Version):
    sha: str

    def get_version(self):
        return self.sha


def parse_version(version: str) -> "GordoRelease | GordoSpecial | GordoPR | GordoSHA":
    """Parse a version / image tag.

    >>> parse_version('2.3.5')
    GordoRelease(major=2, minor=3, patch=5, suffix=None)
    >>> parse_version('latest')
    GordoSpecial(special=<Special.LATEST: 'latest'>)
    >>> parse_version('pr-42')
    GordoPR(number=42)
    >>> parse_version('1.2.3rc1').suffix
    'rc1'
    """
    special_version = Special.find(version)
    if special_version is not None:
        return GordoSpecial(special_version)
    if version.find(pr_prefix) == 0:
        try:
            number = int(version[len(pr_prefix):])
        except ValueError:
            raise ValueError("Malformed PR version '%s'" % version)
        return GordoPR(number)
    m = release_re.match(version)
    if m:
        (major, _, minor, _, _, patch, suffix) = m.groups()
        return GordoRelease(
            int(major),
            int(minor) if minor else None,
            int(patch) if patch else None,
            suffix if suffix else None,
        )
    if sha_re.match(version):
        return GordoSHA(version)
    raise ValueError("Malformed version '%s'" % version)
