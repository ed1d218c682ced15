"""Deploy packaging: sizing arithmetic + spark-submit rendering +
the pipeline-triggers-submit integration (the reference's
Airflow->job trigger shape, run through Pipeline.run_shell)."""

from __future__ import annotations

import shlex

import pytest

from etl_gov_spark.deploy import (
    REFERENCE_SHAPE,
    ClusterShape,
    k8s_submit_command,
    size_executors,
    submit_command,
)


def test_sizing_reference_shape():
    plan = size_executors(REFERENCE_SHAPE)
    # 8 cores -> 7 usable -> one 5-core executor per node, 3 nodes
    assert plan.num_executors == 3
    assert plan.executor_cores == 5
    # 16 GiB * 0.9 = 14745 MiB/node, one executor slot, 10% overhead
    assert plan.memory_overhead_mb == pytest.approx(1474, abs=1)
    assert plan.executor_memory_mb + plan.memory_overhead_mb <= 16 * 1024 * 0.9
    assert plan.shuffle_partitions == 3 * 3 * 5


def test_sizing_big_fleet_scales_linearly():
    small = size_executors(ClusterShape(10, 16, 64))
    big = size_executors(ClusterShape(1000, 16, 64))
    assert big.num_executors == 100 * small.num_executors
    assert big.executor_memory_mb == small.executor_memory_mb
    assert big.shuffle_partitions == 100 * small.shuffle_partitions


def test_sizing_rejects_degenerate_nodes():
    with pytest.raises(ValueError):
        size_executors(ClusterShape(0, 8, 16))
    with pytest.raises(ValueError):
        # many cores but almost no RAM: the per-executor slot falls
        # under the 512 MiB floor after the overhead carve-out
        size_executors(ClusterShape(3, 64, 2))


def test_submit_command_renders_and_caller_conf_wins():
    plan = size_executors(ClusterShape(3, 8, 16))
    argv = submit_command(
        "jobs/etl.py",
        master="yarn",
        plan=plan,
        app_args=("--sf", "100"),
        extra_conf={"spark.sql.shuffle.partitions": "4096"},
        py_files=("dist/etl_gov_spark.zip",),
    )
    assert argv[0] == "spark-submit"
    assert argv[-3:] == ["jobs/etl.py", "--sf", "100"]
    joined = " ".join(argv)
    assert "--master yarn" in joined
    assert "--py-files dist/etl_gov_spark.zip" in joined
    # caller's override beat the plan's 45
    assert "spark.sql.shuffle.partitions=4096" in joined
    assert "spark.sql.shuffle.partitions=45" not in joined
    # every token shell-safe (shlex round-trip is the identity)
    assert shlex.split(shlex.join(argv)) == argv


def test_k8s_submit_mirrors_reference_stack():
    plan = size_executors(REFERENCE_SHAPE)
    argv = k8s_submit_command(
        "local:///opt/app/etl.py",
        k8s_api="https://127.0.0.1:6443",
        image="etl-gov-spark:latest",
        plan=plan,
        namespace="airflow",
    )
    joined = " ".join(argv)
    assert "--master k8s://https://127.0.0.1:6443" in joined
    assert "spark.kubernetes.namespace=airflow" in joined
    assert "spark.kubernetes.container.image=etl-gov-spark:latest" in joined
    assert "spark.executor.instances=3" in joined


def test_pipeline_triggers_submit(spark, tmp_path):
    """run_shell(submit argv) is the Airflow-DAG-triggers-job shape;
    stub spark-submit with a recorder script so the rendered argv is
    executed end to end."""
    from etl_gov_spark.pipeline.core import Pipeline

    plan = size_executors(ClusterShape(3, 8, 16))
    argv = submit_command("jobs/etl.py", master="yarn", plan=plan)
    record = tmp_path / "argv.txt"
    stub = tmp_path / "spark-submit"
    stub.write_text(f'#!/bin/sh\necho "$@" > {record}\necho SUBMITTED\n')
    stub.chmod(0o755)

    p = Pipeline("deploy_demo", spark)
    p.run_shell("submit", shlex.join([str(stub)] + argv[1:]))
    ctx = p.run()
    assert ctx.outputs["submit"] == "SUBMITTED"
    assert "--master yarn" in record.read_text()


def test_python_env_conf_rendering():
    """Packed-venv submit confs: archive aliased, workers pointed at
    the unpacked interpreter, and composable with submit_command."""
    from etl_gov_spark.deploy import (
        REFERENCE_SHAPE,
        python_env_conf,
        size_executors,
        submit_command,
    )

    conf = python_env_conf("s3://bucket/venv.tar.gz")
    assert conf["spark.archives"] == "s3://bucket/venv.tar.gz#environment"
    assert conf["spark.pyspark.python"] == "./environment/bin/python"
    argv = submit_command(
        "job.py", "yarn", size_executors(REFERENCE_SHAPE), extra_conf=conf
    )
    assert any("spark.archives=" in a for a in argv)
