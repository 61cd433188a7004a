"""§3.3 workflow generation: Jinja model templating, machine-count-scaled
resources, shared-scan staging, CLI surface."""

import json

import pytest
import yaml

from gordo_spark.config import Machine
from gordo_spark.workflow import (
    calculate_resources,
    expand_model,
    generate_workflow,
    spark_conf_for,
    workflow_yaml,
)


def test_expand_model_jinja_parity():
    """cli/cli.py:187-216: StrictUndefined -> ValueError with the
    reference's message."""
    cfg = "kind: LinearModel\nfeature_cols: [{{ feat }}]"
    out = expand_model(cfg, {"feat": "click"})
    assert out == {"kind": "LinearModel", "feature_cols": ["click"]}
    with pytest.raises(ValueError, match="Model parameter missing value!"):
        expand_model(cfg, {})


def test_resource_curve_reference_arithmetic():
    """normalized_config.py:23-32 exact clamped-linear curve."""
    r1 = calculate_resources(1)
    assert r1["requests"] == {"memory": 3220, "cpu": 510}
    assert r1["limits"] == {"memory": 3220, "cpu": 10020}
    big = calculate_resources(1000)
    assert big["requests"] == {"memory": 28000, "cpu": 4000}  # clamped
    assert big["limits"]["memory"] == 48000
    # spark confs scale with the curve and stay sane
    small, large = spark_conf_for(1), spark_conf_for(500)
    assert int(large["spark.sql.shuffle.partitions"]) > int(
        small["spark.sql.shuffle.partitions"]
    )
    assert small["spark.sql.adaptive.enabled"] == "true"


def _machine(name, sf_dir, resolution="1H", model=None):
    return Machine(
        name=name,
        dataset={
            "tag_list": ["click", "view"],
            "resolution": resolution,
            "data_provider": {"type": "EventsAsSensorProvider", "sf_dir": sf_dir},
        },
        model=model or {"kind": "LinearModel"},
    )


def test_generate_workflow_groups_shared_scans(sf_dir):
    machines = [
        _machine("m1", sf_dir),
        _machine("m2", sf_dir),           # same plan prefix as m1
        _machine("m3", sf_dir, "10T"),    # different resolution -> own stage
    ]
    spec = generate_workflow(machines, project_name="proj-x")
    assert spec["machines_total"] == 3
    assert len(spec["stages"]) == 2
    sizes = sorted(len(s["machines"]) for s in spec["stages"])
    assert sizes == [1, 2]
    shared = next(s for s in spec["stages"] if len(s["machines"]) == 2)
    assert {m["name"] for m in shared["machines"]} == {"m1", "m2"}
    # evaluation defaults merged under each machine (normalized_config.py:99+)
    assert "metrics" in shared["machines"][0]["evaluation"]
    # round-trips through YAML
    again = yaml.safe_load(workflow_yaml(machines))
    assert again["kind"] == "BuildPlan" and len(again["stages"]) == 2


def test_generate_workflow_expands_templated_model(sf_dir):
    m = _machine(
        "mt", sf_dir,
        model="{'kind': 'DiffBasedAnomalyDetector', 'window': {{ window }}}",
    )
    spec = generate_workflow([m], model_parameters={"window": 12})
    built = spec["stages"][0]["machines"][0]["model"]
    assert built == {"kind": "DiffBasedAnomalyDetector", "window": 12}


def test_workflow_cli(sf_dir, tmp_path, capsys):
    from gordo_spark.cli import main

    cfg = yaml.safe_dump(
        {
            "machines": [
                {
                    "name": "cli-m",
                    "dataset": {
                        "tag_list": ["click"],
                        "resolution": "1H",
                        "data_provider": {
                            "type": "EventsAsSensorProvider",
                            "sf_dir": sf_dir,
                        },
                    },
                }
            ]
        }
    )
    out_file = tmp_path / "plan.yaml"
    rc = main(["workflow", "--config", cfg, "--output", str(out_file)])
    assert rc == 0
    spec = yaml.safe_load(out_file.read_text())
    assert spec["machines_total"] == 1
    assert spec["stages"][0]["machines"][0]["name"] == "cli-m"
    assert main(["workflow", "--config", cfg, "--model-parameter", "bad"]) == 1


def test_version_parsing_reference_parity(sf_dir):
    """util/version.py parity incl. docstring examples + workflow stamping."""
    from gordo_spark.functions.version import (
        ChannelTag, CommitTag, PullRequestTag, ReleaseTag, parse_version,
    )

    assert parse_version("2.3.5") == ReleaseTag(2, 3, 5, "")
    assert parse_version("2.3") == ReleaseTag(2, 3, None, "")
    assert parse_version("2.3").precision == "minor"
    assert parse_version("2").precision == "major"
    assert parse_version("1.2.3rc1") == ReleaseTag(1, 2, 3, "rc1")
    assert parse_version("1.2.3rc1").precision == "patch"
    assert parse_version("1.2.3rc1").tag() == "1.2.3rc1"
    assert isinstance(parse_version("latest"), ChannelTag)
    assert parse_version("stable").tag() == "stable"
    assert parse_version("pr-42") == PullRequestTag(42)
    assert parse_version("abcdef1234") == CommitTag("abcdef1234")
    # all-digit strings too long for a release major fall through to commit
    assert parse_version("12345678") == CommitTag("12345678")
    # a suffix is only legal after a minor component
    with pytest.raises(ValueError):
        parse_version("1rc1")
    for bad in ("pr-xyz", "not_a_version!", ""):
        with pytest.raises(ValueError):
            parse_version(bad)
    spec = generate_workflow([_machine("vm", sf_dir)], version="1.2.3")
    assert spec["version"] == "1.2.3"
    with pytest.raises(ValueError):
        generate_workflow([_machine("vm", sf_dir)], version="!bad!")
