"""§3.3 — workflow generation: machine config -> executable build plan.

The reference's third entry point turns a multi-machine YAML config into an
Argo workflow (gordo/cli/workflow_generator.py:330-430 in /root/reference):
one builder pod per machine, machine-count-scaled resource requests
(workflow/config_elements/normalized_config.py:23-32), Jinja
``--model-parameter`` templating of the model config (cli/cli.py:187-216),
and default runtime/evaluation globals merged under each machine
(normalized_config.py:66-107).

The Spark-native analogue generated here is not a pod-per-machine DAG —
that is exactly the N-scans-of-the-lake shape ``plans/multi.py`` exists to
avoid — but a staged SPARK plan:

- machines are grouped by shared plan prefix (provider + resample +
  interpolation agree); each group is ONE stage that runs its scan once
  and fans out the per-machine tails (``shared_wide_frames``);
- the session resources for the run are scaled from machine count with the
  reference's resource-curve shape, expressed as spark confs
  (shuffle partitions / executor memory / max cores) instead of pod
  requests;
- the spec is plain YAML: inspectable, diffable, and replayable through
  ``python -m gordo_spark.cli build`` per stage.
"""

from __future__ import annotations

import json

from gordo_spark.config import Machine

DEFAULT_EVALUATION = {
    # normalized_config.py:99-107 defaults
    "cv_mode": "full_build",
    "metrics": [
        "explained_variance_score",
        "r2_score",
        "mean_squared_error",
        "mean_absolute_error",
    ],
}


def expand_model(model_config: str, model_parameters: dict) -> object:
    """Jinja-expand a model config template (cli/cli.py:187-216 parity,
    including StrictUndefined -> ValueError on a missing parameter)."""
    import jinja2
    import yaml

    try:
        template = jinja2.Environment(
            loader=jinja2.BaseLoader(), undefined=jinja2.StrictUndefined
        ).from_string(model_config)
        rendered = template.render(**model_parameters)
    except jinja2.exceptions.UndefinedError as e:
        raise ValueError("Model parameter missing value!") from e
    return yaml.safe_load(rendered)


def calculate_resources(nr_of_machines: int) -> dict:
    """Machine-count-scaled resource curve — the reference's exact
    request/limit arithmetic (normalized_config.py:23-32: linear in machine
    count, clamped)."""
    return {
        "requests": {
            "memory": min(3000 + (220 * nr_of_machines), 28000),
            "cpu": min(500 + (10 * nr_of_machines), 4000),
        },
        "limits": {
            "memory": min(3000 + (220 * nr_of_machines), 48000),
            "cpu": 10000 + (20 * nr_of_machines),
        },
    }


def spark_conf_for(nr_of_machines: int, executor_cores: int = 4) -> dict[str, str]:
    """The resource curve re-expressed as Spark session confs: shuffle
    partitions track total cores (2-3x), executor memory tracks the
    per-machine working set. Deterministic, clamped, and documented so a
    deployment can override — the point is the POLICY (resources scale with
    machine count), not the constants."""
    res = calculate_resources(nr_of_machines)
    total_cores = max(executor_cores, res["requests"]["cpu"] // 250)
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.shuffle.partitions": str(max(32, 4 * total_cores)),
        "spark.executor.cores": str(executor_cores),
        "spark.executor.memory": f"{max(2, res['requests']['memory'] // 1000)}g",
        "spark.dynamicAllocation.enabled": "true",
        "spark.dynamicAllocation.maxExecutors": str(
            max(2, total_cores // executor_cores)
        ),
    }


def generate_workflow(
    machines: list[Machine],
    model_parameters: dict | None = None,
    project_name: str = "gordo-spark",
    version: str | None = None,
) -> dict:
    """Machine configs -> staged build-plan spec (the Argo-YAML analogue).

    Machines whose dataset plans share a prefix become ONE stage with a
    shared scan; every stage lists its members so
    ``cli build --machine <name>`` replays any one of them. Model configs
    given as STRINGS are treated as Jinja templates and expanded with
    ``model_parameters`` first (cli/cli.py:187-216 surface).
    """
    from gordo_spark.builder import dataset_from_dict
    from gordo_spark.plans.multi import _plan_key

    expanded: list[Machine] = []
    for m in machines:
        if isinstance(m.model, str):
            m = Machine(
                name=m.name,
                dataset=m.dataset,
                model=expand_model(m.model, model_parameters or {}),
                evaluation=m.evaluation,
                metadata=m.metadata,
                runtime=m.runtime,
            )
        expanded.append(m)

    groups: dict[str, list[Machine]] = {}
    for m in expanded:
        key = _plan_key(dataset_from_dict(m.dataset))
        groups.setdefault(key, []).append(m)

    stages = []
    for i, (key, members) in enumerate(sorted(groups.items())):
        stages.append(
            {
                "name": f"shared-scan-{i}",
                "plan_key": json.loads(key),
                "machines": [
                    {
                        "name": m.name,
                        "model": m.model,
                        "evaluation": {**DEFAULT_EVALUATION, **(m.evaluation or {})},
                    }
                    for m in members
                ],
            }
        )
    spec_version = None
    if version is not None:
        from gordo_spark.functions.version import parse_version

        # validates release / latest|stable / pr-N / sha tag shapes
        # (reference util/version.py — malformed tags fail HERE, not at
        # deploy time)
        spec_version = parse_version(version).tag()

    return {
        "apiVersion": "gordo-spark/v1",
        "kind": "BuildPlan",
        "project": project_name,
        **({"version": spec_version} if spec_version else {}),
        "machines_total": len(expanded),
        "spark_conf": spark_conf_for(len(expanded)),
        "resources": calculate_resources(len(expanded)),
        "stages": stages,
    }


def workflow_yaml(
    machines: list[Machine],
    model_parameters: dict | None = None,
    project_name: str = "gordo-spark",
) -> str:
    import yaml

    return yaml.safe_dump(
        generate_workflow(machines, model_parameters, project_name),
        sort_keys=False,
        default_flow_style=False,
    )
