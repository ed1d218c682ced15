"""Cluster deploy: executor sizing + spark-submit / k8s packaging.

Spark-first analogue of the reference's deploy surface
(``install.sh`` — kind cluster from ``infra/cluster.yaml`` with one
control plane + three workers, Airflow Helm release from
``airflow/override-values.yaml``): instead of Helm-templating an
orchestrator, the engine ships (a) a sizing calculator that turns a
cluster shape into the executor/memory/shuffle confs that actually
govern 100 TB behavior, and (b) builders that render a complete
``spark-submit`` argv for YARN/standalone or Kubernetes. The
pipeline DSL's ``run_shell`` task runs the rendered command, which
is exactly the reference's Airflow->job trigger shape.

Everything here is pure, driver-side string/dict logic — unit-
testable in this container, runnable unchanged against a real
cluster.

Sizing rules (standard public guidance, e.g. the Spark tuning docs):
- reserve 1 core + ~10% memory per node for OS/daemons
- ~5 cores per executor (HDFS/object-store client throughput sweet
  spot; more gives diminishing returns, fewer wastes JVM overhead)
- executor memoryOverhead = max(384 MiB, 10% of executor memory)
- shuffle partitions ~= 3x total executor cores (per-task inputs
  stay comfortably under memory at the target scale; AQE coalesces
  the excess at runtime)
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ClusterShape:
    """Worker-node fleet (the reference's kind-cluster has 3)."""

    workers: int
    cores_per_worker: int
    memory_gb_per_worker: int


@dataclass(frozen=True)
class ExecutorPlan:
    num_executors: int
    executor_cores: int
    executor_memory_mb: int
    memory_overhead_mb: int
    shuffle_partitions: int
    max_partition_bytes: int

    def to_conf(self) -> dict[str, str]:
        return {
            "spark.executor.instances": str(self.num_executors),
            "spark.executor.cores": str(self.executor_cores),
            "spark.executor.memory": f"{self.executor_memory_mb}m",
            "spark.executor.memoryOverhead": f"{self.memory_overhead_mb}m",
            "spark.sql.shuffle.partitions": str(self.shuffle_partitions),
            "spark.sql.files.maxPartitionBytes": str(self.max_partition_bytes),
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
        }


def size_executors(
    shape: ClusterShape,
    cores_per_executor: int = 5,
    max_partition_bytes: int = 128 * 1024 * 1024,
) -> ExecutorPlan:
    """Turn a node fleet into an executor plan.

    Deterministic arithmetic, no environment probing: usable cores =
    cores-1 per node, usable memory = 90%; executors per node =
    usable_cores // cores_per_executor (floor, min 1 with the cores
    clamped to what the node has); executor memory splits the usable
    node memory across that node's executors, minus the 10%/384 MiB
    overhead carve-out.
    """
    if shape.workers < 1 or shape.cores_per_worker < 1:
        raise ValueError(f"degenerate cluster shape: {shape}")
    usable_cores = max(shape.cores_per_worker - 1, 1)
    exec_cores = min(cores_per_executor, usable_cores)
    per_node = max(usable_cores // exec_cores, 1)
    usable_mem_mb = int(shape.memory_gb_per_worker * 1024 * 0.9)
    slot_mb = usable_mem_mb // per_node
    overhead_mb = max(384, slot_mb // 10)
    plan = ExecutorPlan(
        num_executors=per_node * shape.workers,
        executor_cores=exec_cores,
        executor_memory_mb=slot_mb - overhead_mb,
        memory_overhead_mb=overhead_mb,
        shuffle_partitions=3 * per_node * shape.workers * exec_cores,
        max_partition_bytes=max_partition_bytes,
    )
    if plan.executor_memory_mb < 512:
        raise ValueError(
            f"nodes too small: {plan.executor_memory_mb} MiB/executor "
            f"after overhead (need >= 512)"
        )
    return plan


def submit_command(
    app: str,
    master: str,
    plan: ExecutorPlan,
    app_args: tuple[str, ...] = (),
    deploy_mode: str = "cluster",
    name: str = "etl-gov-spark",
    extra_conf: dict[str, str] | None = None,
    py_files: tuple[str, ...] = (),
) -> list[str]:
    """Render a complete ``spark-submit`` argv (pure; nothing runs).

    Conf precedence: sizing plan < extra_conf (the caller's word is
    final, same as spark-submit's own last-wins rule).
    """
    conf = {**plan.to_conf(), **(extra_conf or {})}
    argv = [
        "spark-submit",
        "--master", master,
        "--deploy-mode", deploy_mode,
        "--name", name,
    ]
    if py_files:
        argv += ["--py-files", ",".join(py_files)]
    for k in sorted(conf):
        argv += ["--conf", f"{k}={conf[k]}"]
    argv.append(app)
    argv += list(app_args)
    return argv


def k8s_submit_command(
    app: str,
    k8s_api: str,
    image: str,
    plan: ExecutorPlan,
    namespace: str = "spark",
    service_account: str = "spark",
    app_args: tuple[str, ...] = (),
    extra_conf: dict[str, str] | None = None,
) -> list[str]:
    """spark-submit argv targeting Kubernetes — the engine's answer
    to the reference's kind+Helm stack: the scheduler IS k8s, no
    Helm chart needed; executors are pods sized by the same plan."""
    conf = {
        "spark.kubernetes.container.image": image,
        "spark.kubernetes.namespace": namespace,
        "spark.kubernetes.authenticate.driver.serviceAccountName": service_account,
        # executor pods come and go; cap the pending burst so the
        # API server isn't flooded on a 1000-executor start
        "spark.kubernetes.allocation.batch.size": "10",
        **(extra_conf or {}),
    }
    return submit_command(
        app,
        master=f"k8s://{k8s_api}",
        plan=plan,
        app_args=app_args,
        deploy_mode="cluster",
        extra_conf=conf,
    )


# The reference's fleet: infra/cluster.yaml = 3 kind workers. A kind
# worker inherits the host's resources, so size-for-parity assumes a
# developer-laptop-class node; override for a real fleet.
REFERENCE_SHAPE = ClusterShape(workers=3, cores_per_worker=8, memory_gb_per_worker=16)


def executor_override_conf(executor_config: dict) -> dict[str, str]:
    """Render a task's ``executor_config`` into submit confs — the
    per-task executor routing surface (≈ the reference's
    ``executor_config`` pod overrides in
    dags/example_kubernetes_executor.py + the queue routing in
    example_local_kubernetes_executor.py).

    Spark's unit of executor sizing is the APPLICATION, so a task
    that needs different hardware ships as its own submit: the
    pipeline stays one DAG, and the heavy task's ``run_shell``
    command is ``submit_command(..., extra_conf=
    executor_override_conf(task.executor_config))``. Keys:

    - ``cpus`` / ``memory_gb`` — executor size for this task's app
      (also rendered as k8s pod requests so the scheduler actually
      reserves them)
    - ``gpus`` — ``spark.executor.resource.gpu.amount`` (the Spark
      resource-scheduling conf; discovery script is cluster-owned)
    - ``pool`` — fair-scheduler pool; also applied in-process at run
      time by the Pipeline runner (thread-scoped local property)
    - ``node_selector`` — dict rendered to
      ``spark.kubernetes.node.selector.*`` (the kubernetes-executor
      affinity analogue)

    Pure rendering; unknown keys raise so a typo'd override never
    silently schedules on default hardware.
    """
    known = {"cpus", "memory_gb", "gpus", "pool", "node_selector"}
    unknown = set(executor_config) - known
    if unknown:
        raise ValueError(f"unknown executor_config keys: {sorted(unknown)}")
    conf: dict[str, str] = {}
    if "cpus" in executor_config:
        cpus = int(executor_config["cpus"])
        conf["spark.executor.cores"] = str(cpus)
        conf["spark.kubernetes.executor.request.cores"] = str(cpus)
    if "memory_gb" in executor_config:
        mem_mb = int(executor_config["memory_gb"] * 1024)
        conf["spark.executor.memory"] = f"{mem_mb}m"
        conf["spark.executor.memoryOverhead"] = f"{max(384, mem_mb // 10)}m"
    if "gpus" in executor_config:
        conf["spark.executor.resource.gpu.amount"] = str(
            int(executor_config["gpus"])
        )
        conf["spark.task.resource.gpu.amount"] = "1"
    if "pool" in executor_config:
        conf["spark.scheduler.pool"] = str(executor_config["pool"])
    for k, v in (executor_config.get("node_selector") or {}).items():
        conf[f"spark.kubernetes.node.selector.{k}"] = str(v)
    return conf


def python_env_conf(
    archive: str, python_rel_path: str = "bin/python"
) -> dict[str, str]:
    """Executor-side Python-dependency isolation for a cluster
    submit: ship a packed venv/conda archive (`venv-pack` /
    `conda-pack` output) and point every Python worker at its
    interpreter — the cluster-wide counterpart of the driver-side
    ``Pipeline.run_python_venv`` task (tutorial_taskflow_api_
    virtualenv.py parity at executor scale). Returns the conf pairs
    for ``submit_command(extra_conf=...)``:

    - ``spark.archives`` = ``{archive}#environment`` (unpacked into
      every executor's working dir under the alias)
    - ``spark.pyspark.python`` = the unpacked interpreter, used by
      every Pandas-UDF / mapInPandas worker

    Pure rendering — nothing is packed or shipped here.
    """
    alias = "environment"
    return {
        "spark.archives": f"{archive}#{alias}",
        "spark.pyspark.python": f"./{alias}/{python_rel_path}",
    }
