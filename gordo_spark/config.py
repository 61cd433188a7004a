"""S11 — machine config loading: YAML multi-machine configs with global
patching, plus the validator surface.

Reference semantics:
- ``Machine.from_config`` patches globals into each machine dict
  (gordo/machine/machine.py:77-149 in /root/reference); the patch is
  add-or-replace-only dict union (``patch_dict``,
  gordo/workflow/workflow_generator/helpers.py:16-45).
- validators: tz-aware start<end dates (gordo/machine/validators.py:234-254),
  k8s-charset names <= 63 chars (validators.py:269-318), resolution must be
  a pandas offset alias (validators.py:54-77).
- tag-list dedup by name preserving order (gordo/utils.py:35-50).

All driver-side plain Python — machines are rows of a config table; each
machine drives one Spark DAG (SURVEY.md §3.3: the reference's one-pod-per-
machine parallelism becomes concurrent job submission on one cluster).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime

from gordo_spark.functions.timeutil import offset_alias_to_seconds

_NAME_RE = re.compile(r"^[a-z0-9]([a-z0-9\-]{0,61}[a-z0-9])?$")


def _maybe_yaml(v):
    """Reference configs embed YAML documents as string field values. A
    string that does NOT parse as YAML stays a string — e.g. a Jinja model
    template (``{{ param }}``), expanded later by workflow.expand_model."""
    if isinstance(v, str) and ("\n" in v or ": " in v):
        import yaml

        try:
            parsed = yaml.safe_load(v)
        except yaml.YAMLError:
            return v
        if isinstance(parsed, dict):
            return parsed
    return v


def patch_dict(base: dict, patch: dict) -> dict:
    """Add-or-replace-only recursive dict union (globals ⊕ machine)."""
    out = dict(base)
    for k, v in patch.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = patch_dict(out[k], v)
        else:
            out[k] = v
    return out


def validate_name(name: str) -> str:
    if not _NAME_RE.match(name or ""):
        raise ValueError(
            f"invalid machine name {name!r}: must match k8s DNS charset, <= 63 chars"
        )
    return name


def parse_iso_tz(value) -> datetime:
    """ISO-8601 parse, timezone REQUIRED (naive datetimes rejected)."""
    if isinstance(value, datetime):
        dt = value
    else:
        dt = datetime.fromisoformat(str(value).replace("Z", "+00:00"))
    if dt.tzinfo is None:
        raise ValueError(f"naive datetime rejected (timezone required): {value!r}")
    return dt


def validate_dates(start, end) -> tuple[datetime, datetime]:
    s, e = parse_iso_tz(start), parse_iso_tz(end)
    if not s < e:
        raise ValueError(f"train_start_date {s} must be < train_end_date {e}")
    return s, e


def dedup_tags(tags: list) -> list:
    """Dedup by name preserving order (tags may be str or {name: ...})."""
    seen, out = set(), []
    for t in tags:
        name = t["name"] if isinstance(t, dict) else t
        if name not in seen:
            seen.add(name)
            out.append(t)
    return out


@dataclass
class Machine:
    """Unit of deployment: a query + a model + an evaluation spec."""

    name: str
    dataset: dict
    model: dict = field(default_factory=lambda: {"kind": "LinearModel"})
    evaluation: dict = field(
        default_factory=lambda: {"cv_mode": "full_build", "n_splits": 3, "seed": 0}
    )
    metadata: dict = field(default_factory=dict)
    runtime: dict = field(default_factory=dict)

    @classmethod
    def from_config(cls, machine_dict: dict, globals_dict: dict | None = None) -> "Machine":
        g = {k: _maybe_yaml(v) for k, v in (globals_dict or {}).items()}
        # the reference allows per-machine YAML-in-string fields
        # (gordo/machine/loader.py:39-116) and a `tags` alias for tag_list
        d = {k: _maybe_yaml(v) for k, v in machine_dict.items()}
        d["dataset"] = patch_dict(g.get("dataset", {}), d.get("dataset") or {})
        ds = d["dataset"]
        if "tags" in ds and "tag_list" not in ds:
            ds["tag_list"] = ds.pop("tags")
        d["model"] = d.get("model") or g.get("model") or {"kind": "LinearModel"}
        d["evaluation"] = patch_dict(g.get("evaluation", {}), d.get("evaluation") or {})
        d["runtime"] = patch_dict(g.get("runtime", {}), d.get("runtime") or {})
        m = cls(
            name=validate_name(d["name"]),
            dataset=d["dataset"],
            model=d["model"],
            evaluation=d["evaluation"],
            metadata=d.get("metadata", {}),
            runtime=d["runtime"],
        )
        ds = m.dataset
        if "train_start_date" in ds and "train_end_date" in ds:
            validate_dates(ds["train_start_date"], ds["train_end_date"])
        if "resolution" in ds:
            offset_alias_to_seconds(ds["resolution"])  # raises if invalid
        if "tag_list" in ds:
            ds["tag_list"] = dedup_tags(ds["tag_list"])
        return m

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "dataset": self.dataset,
            "model": self.model,
            "evaluation": self.evaluation,
            "metadata": self.metadata,
            "runtime": self.runtime,
        }


def load_machines(config: dict) -> list[Machine]:
    """Multi-machine config: ``{machines: [...], globals: {...}}``. Also
    accepts the reference's Gordo CRD wrapper
    (``{apiVersion, kind: Gordo, spec: {config: {...}}}``,
    examples/config.yaml in /root/reference) so existing configs load
    unchanged."""
    if "spec" in config and "machines" not in config:
        config = config.get("spec", {}).get("config", config)
    g = config.get("globals", {})
    return [Machine.from_config(m, g) for m in config.get("machines", [])]


def load_yaml_config(path_or_str: str) -> list[Machine]:
    import yaml

    if "\n" in path_or_str or ":" in path_or_str.split("/")[-1]:
        cfg = yaml.safe_load(path_or_str)
    else:
        with open(path_or_str) as f:
            cfg = yaml.safe_load(f)
    return load_machines(cfg)
