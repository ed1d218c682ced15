"""Pipeline DSL — the orchestration spine (SURVEY.md §2.G).

Spark-first re-expression of the reference's Airflow capabilities
(its ``dags/`` tree: taskflow DAGs, branch/short-circuit operators,
dynamic task mapping, task groups, sensors, datasets, setup/
teardown). The key inversion: in Airflow a task DAG *moves data
between processes*; here the DAG wires *lazy DataFrames* — running
a pipeline composes one Catalyst logical plan per sink, so the
optimizer sees through task boundaries (filters written in a late
task push down into an early task's scan). Control-flow constructs
(branch, short-circuit, sensors) run at plan-construction time on
the driver; data never leaves the cluster.

Capability map (reference file → here):
- ``tutorial_taskflow_api.py`` @task chains     → ``Pipeline.task``
- ``example_branch_operator.py``                → ``Pipeline.branch``
- ``example_short_circuit_operator.py``         → ``Pipeline.short_circuit``
- ``example_dynamic_task_mapping.py``           → ``Pipeline.fan_out``
- ``example_task_group.py``                     → ``Pipeline.task_group``
- ``example_sensors.py``                        → ``Pipeline.sensor``
- ``example_datasets.py`` / dataset aliases     → ``Dataset`` + ``DatasetRegistry``
- ``example_setup_teardown.py``                 → ``Pipeline.setup`` / ``teardown``
- ``example_xcom.py`` (xcom push/pull)          → ``PipelineContext.outputs``
- ``dags/sql/sample.sql`` (SQL operator)        → ``Pipeline.run_sql``
- ``example_trigger_controller_dag.py`` /
  ``example_trigger_target_dag.py``             → ``Pipeline.trigger`` (conf payload)
- ``example_external_task_marker_dag.py``       → ``RunLedger`` +
  ``external_task_sensor`` / ``external_task_marker``
- ``example_time_delta_sensor_async.py``        → ``sensor(deferrable=True)`` +
  ``time_delta_sensor`` (rescheduled between pokes, never holds the slot)
- ``plugins/event_listener.py`` /
  ``listener_plugin.py``                        → ``PipelineListener`` registry
- ``plugins/decreasing_priority_weight_strategy.py`` → ``priority_weight``
  (ready-task ordering; Spark fair-scheduler pools are the cluster analogue)
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .schedule import DataInterval, Timetable, parse_schedule


class TaskSkipped(Exception):
    """Raised internally to mark a task skipped (branch not taken /
    upstream short-circuit)."""


class SensorTimeout(TimeoutError):
    """Sensor did not observe its condition within the timeout."""


class TaskReschedule(Exception):
    """Raised by a deferrable sensor after a false poke: the runner
    leaves the task pending, executes other ready tasks, and only
    sleeps when nothing else can make progress (≈ Airflow deferred /
    mode='reschedule' — the poke never holds the worker slot)."""

    def __init__(self, next_poke_at: float) -> None:
        super().__init__(f"reschedule at {next_poke_at}")
        self.next_poke_at = next_poke_at


class RunLedger:
    """Process-local cross-pipeline completion ledger (≈ the Airflow
    metadata DB that ExternalTaskSensor queries). Pipelines attached
    to a ledger record every completed task under (pipeline, task,
    run_key); other pipelines' external sensors poll it. On a
    cluster this would back onto a metastore/delta table — the
    record/is_complete interface is what matters."""

    def __init__(self) -> None:
        self._done: set[tuple[str, str, Any]] = set()

    def record(self, pipeline: str, task: str, run_key: Any = None) -> None:
        self._done.add((pipeline, task, run_key))

    def is_complete(self, pipeline: str, task: str, run_key: Any = None) -> bool:
        return (pipeline, task, run_key) in self._done


@dataclass
class PipelineListener:
    """Lifecycle listener (≈ plugins/event_listener.py): any subset
    of callbacks; unset hooks are no-ops. Task hooks receive
    (ctx, task_name) — plus the exception for failures."""

    on_pipeline_started: Callable[[PipelineContext], None] | None = None
    on_pipeline_finished: Callable[[PipelineContext], None] | None = None
    on_task_started: Callable[[PipelineContext, str], None] | None = None
    on_task_succeeded: Callable[[PipelineContext, str], None] | None = None
    on_task_failed: Callable[[PipelineContext, str, Exception], None] | None = None
    on_task_skipped: Callable[[PipelineContext, str], None] | None = None
    # fired when a task finishes but ran longer than its sla_s
    # (≈ the reference's per-task `sla=timedelta(...)` +
    # sla_miss_callback, dags/example_sla_dag.py:50); receives
    # (ctx, task_name, duration_s, sla_s)
    on_task_sla_miss: (
        Callable[[PipelineContext, str, float, float], None] | None
    ) = None


class ParamValidationError(ValueError):
    """A supplied or default param value violates its Param schema."""


_PARAM_PY_TYPES: dict[str, tuple[type, ...]] = {
    "string": (str,),
    "integer": (int,),
    "number": (int, float),
    "boolean": (bool,),
    "array": (list, tuple),
    "object": (dict,),
    "null": (type(None),),
}


@dataclass
class Param:
    """Declared, validated pipeline param (≈ airflow.models.param.Param,
    reference ``dags/example_params_trigger_ui.py:43``): a default plus
    a JSON-schema-ish constraint set. ``type`` uses the JSON-schema
    names (string/integer/number/boolean/array/object/null) or a tuple
    of them; ``enum`` restricts to listed values."""

    default: Any = None
    type: str | tuple[str, ...] | None = None
    enum: list[Any] | None = None
    description: str = ""
    title: str = ""
    minimum: float | None = None
    maximum: float | None = None

    def validate(self, name: str, value: Any) -> Any:
        if self.type is not None:
            names = (self.type,) if isinstance(self.type, str) else tuple(self.type)
            allowed: tuple[type, ...] = ()
            for n in names:
                if n not in _PARAM_PY_TYPES:
                    raise ParamValidationError(f"param {name}: unknown type {n!r}")
                allowed += _PARAM_PY_TYPES[n]
            # bool is an int subclass: only accept it when "boolean" asked
            if isinstance(value, bool) and "boolean" not in names:
                raise ParamValidationError(
                    f"param {name}: expected {names}, got boolean {value!r}"
                )
            if not isinstance(value, allowed):
                raise ParamValidationError(
                    f"param {name}: expected {names}, got {type(value).__name__}"
                )
        if self.enum is not None and value not in self.enum:
            raise ParamValidationError(
                f"param {name}: {value!r} not in enum {self.enum!r}"
            )
        if self.minimum is not None and value < self.minimum:
            raise ParamValidationError(f"param {name}: {value!r} < min {self.minimum}")
        if self.maximum is not None and value > self.maximum:
            raise ParamValidationError(f"param {name}: {value!r} > max {self.maximum}")
        return value


@dataclass
class Dataset:
    """A named, versioned data product (≈ Airflow Dataset/alias).

    Producers bump ``version`` on publish; consumer pipelines can
    gate on freshness via ``DatasetRegistry.is_fresher_than``.
    """

    name: str
    uri: str | None = None


@dataclass(frozen=True)
class DatasetAlias:
    """Late-bound dataset indirection (≈ airflow.datasets.DatasetAlias,
    reference ``dags/example_dataset_alias.py:1``): a task declares the
    alias as its outlet and resolves it to concrete Dataset(s) at run
    time via ``ctx.outlet_events[alias].add(Dataset(...))``. Until
    first resolution, alias subscribers are pending (the reference's
    "Unresolved DatasetAlias" state); resolution attaches them to the
    target and fires them on each publish."""

    name: str


class _AliasEvents:
    """Per-run accumulator behind ``ctx.outlet_events[name]``."""

    def __init__(self) -> None:
        self.datasets: list[Dataset] = []

    def add(self, ds: Dataset) -> None:
        self.datasets.append(ds)


class _OutletEvents(dict):
    def __missing__(self, key: str) -> _AliasEvents:
        self[key] = _AliasEvents()
        return self[key]


class DatasetRegistry:
    """Process-local dataset ledger: publish events + versions.

    On a cluster this would back onto a metastore table; the
    interface (publish/version/subscribe) is what matters.
    """

    def __init__(self) -> None:
        self._versions: dict[str, int] = {}
        self._subscribers: dict[str, list[Callable[[Dataset, int], None]]] = {}
        self._aliases: dict[str, set[str]] = {}  # alias -> resolved dataset names
        self._pending_alias_subs: dict[str, list[Callable[[Dataset, int], None]]] = {}

    def publish(self, ds: Dataset) -> int:
        v = self._versions.get(ds.name, 0) + 1
        self._versions[ds.name] = v
        for cb in self._subscribers.get(ds.name, []):
            cb(ds, v)
        return v

    def version(self, name: str) -> int:
        return self._versions.get(name, 0)

    def subscribe(self, name: str, cb: Callable[[Dataset, int], None]) -> None:
        self._subscribers.setdefault(name, []).append(cb)

    def is_fresher_than(self, name: str, version: int) -> bool:
        return self.version(name) > version

    # -- alias indirection (≈ DatasetAlias, example_dataset_alias.py) --

    def alias_targets(self, alias: str) -> set[str]:
        """Dataset names an alias has resolved to (empty = unresolved,
        the reference's "Unresolved DatasetAlias" schedule state)."""
        return set(self._aliases.get(alias, ()))

    def subscribe_alias(self, alias: str, cb: Callable[[Dataset, int], None]) -> None:
        """Subscribe through an alias: fires for publishes of every
        dataset the alias resolves to — including resolutions that
        happen later (the reference re-parses consumer DAGs when an
        alias first resolves; here the pending subscription attaches
        at resolution time)."""
        for target in self._aliases.get(alias, ()):
            self.subscribe(target, cb)
        self._pending_alias_subs.setdefault(alias, []).append(cb)

    def resolve_alias(self, alias: str, ds: Dataset) -> None:
        """Bind alias -> ds (idempotent, additive: an alias may fan
        out to several datasets across runs)."""
        known = self._aliases.setdefault(alias, set())
        if ds.name not in known:
            known.add(ds.name)
            for cb in self._pending_alias_subs.get(alias, []):
                self.subscribe(ds.name, cb)

    def publish_via_alias(self, alias: str, ds: Dataset) -> int:
        """Runtime alias publish (≈ outlet_events[alias].add(ds)):
        resolve then publish the concrete dataset."""
        self.resolve_alias(alias, ds)
        return self.publish(ds)


@dataclass
class PipelineContext:
    """Run-scoped state: the xcom analogue (``outputs``), params,
    and skip bookkeeping."""

    spark: SparkSession
    params: dict[str, Any] = field(default_factory=dict)
    outputs: dict[str, Any] = field(default_factory=dict)
    skipped: set[str] = field(default_factory=set)
    registry: DatasetRegistry | None = None
    attempts: dict[str, int] = field(default_factory=dict)
    started_at: float = field(default_factory=time.monotonic)
    sensor_deadlines: dict[str, float] = field(default_factory=dict)
    outlet_events: _OutletEvents = field(default_factory=_OutletEvents)
    data_interval: DataInterval | None = None
    # (task_name, duration_s, sla_s) for every task that ran longer
    # than its declared SLA — populated even with no listener, so a
    # post-run audit can read misses off the context
    sla_misses: list[tuple[str, float, float]] = field(default_factory=list)

    def pull(self, task_name: str) -> Any:
        """xcom_pull: fetch an upstream task's return value."""
        if task_name in self.skipped:
            raise TaskSkipped(task_name)
        return self.outputs[task_name]


@dataclass
class _Task:
    name: str
    fn: Callable[[PipelineContext], Any]
    deps: tuple[str, ...]
    outputs_dataset: Dataset | DatasetAlias | None = None
    trigger_rule: str = "all_success"  # or "none_failed" (runs even if deps skipped)
    retries: int = 0  # ≈ Airflow task retries
    retry_delay_s: float = 0.0
    on_failure: Callable[[PipelineContext, Exception], None] | None = None
    priority_weight: int = 1  # higher runs first among ready tasks
    display_name: str | None = None  # ≈ task_display_name (UI label)
    sla_s: float | None = None  # duration SLA (≈ task sla=timedelta)
    on_sla_miss: Callable[[PipelineContext, str, float, float], None] | None = None
    # per-task executor routing (≈ executor_config / queue in
    # example_kubernetes_executor.py + example_local_kubernetes_executor.py):
    # "pool" routes this task's Spark jobs to a fair-scheduler pool
    # at run time; sizing keys (cpus/memory_gb/...) are rendered into
    # submit confs by deploy.executor_override_conf for cluster runs
    executor_config: dict[str, Any] | None = None
    # per-incoming-edge labels, dep name → label (≈ Label("yes") in
    # example_branch_labels.py — graph-view annotation, no semantics).
    # LAST field: several call sites construct _Task positionally.
    edge_labels: dict[str, str] | None = None


class Pipeline:
    """A named DAG of driver-side tasks wiring lazy DataFrames."""

    def __init__(
        self,
        name: str,
        spark: SparkSession,
        params: dict[str, Any] | None = None,
        registry: DatasetRegistry | None = None,
        ledger: RunLedger | None = None,
        schedule: "str | Timetable | timedelta | None" = None,
        display_name: str | None = None,
    ) -> None:
        self.name = name
        self.display_name = display_name or name  # ≈ dag_display_name
        self.spark = spark
        self.params = params or {}
        self.registry = registry
        self.ledger = ledger
        self.timetable: Timetable | None = (
            parse_schedule(schedule) if schedule is not None else None
        )
        self._tasks: dict[str, _Task] = {}
        self._order: list[str] = []
        self._setup: list[Callable[[PipelineContext], None]] = []
        self._teardown: list[Callable[[PipelineContext], None]] = []
        self._group_prefix: list[str] = []
        self._listeners: list[PipelineListener] = []

    def add_listener(self, listener: PipelineListener) -> PipelineListener:
        """Register a lifecycle listener (≈ listener plugin)."""
        self._listeners.append(listener)
        return listener

    def _emit(self, hook: str, *args: Any) -> None:
        for lis in self._listeners:
            cb = getattr(lis, hook)
            if cb is not None:
                cb(*args)

    # -- registration -------------------------------------------------

    def _qualify(self, name: str) -> str:
        return ".".join([*self._group_prefix, name])

    def _add(self, task: _Task) -> str:
        if task.name in self._tasks:
            raise ValueError(f"duplicate task: {task.name}")
        self._tasks[task.name] = task
        self._order.append(task.name)
        return task.name

    def task(
        self,
        name: str,
        deps: Iterable[str] = (),
        outputs: Dataset | None = None,
        trigger_rule: str = "all_success",
        retries: int = 0,
        retry_delay_s: float = 0.0,
        on_failure: Callable[[PipelineContext, Exception], None] | None = None,
        priority_weight: int = 1,
        display_name: str | None = None,
        sla_s: float | None = None,
        on_sla_miss: (
            Callable[[PipelineContext, str, float, float], None] | None
        ) = None,
        executor_config: dict[str, Any] | None = None,
    ) -> Callable:
        """Register ``fn(ctx) -> Any`` as a task (≈ @task). The
        return value is the task's xcom; DataFrames stay lazy.
        ``retries``/``retry_delay_s``/``on_failure`` mirror Airflow's
        task retries and failure callbacks: transient driver-side
        failures (a sensor racing a feed, a flaky external call)
        re-attempt; the callback fires once after the final attempt
        fails, before the pipeline aborts. ``display_name`` is the
        human-facing label (≈ task_display_name) surfaced by
        ``describe()``; the task NAME stays the dependency key.
        ``sla_s`` declares a duration SLA (≈ ``sla=timedelta`` +
        sla_miss_callback, reference dags/example_sla_dag.py:50): a
        task that SUCCEEDS but overruns it still completes normally —
        the miss is recorded on ``ctx.sla_misses``, the task-level
        ``on_sla_miss`` fires, and listeners get
        ``on_task_sla_miss``; nothing fails or aborts.
        ``executor_config`` is per-task executor routing (≈ the
        reference's ``executor_config`` pod overrides,
        dags/example_kubernetes_executor.py): ``{"pool": name}``
        routes the task's Spark jobs to a fair-scheduler pool at run
        time; sizing keys (``cpus``/``memory_gb``/``gpus``) are
        rendered into submit confs by
        ``deploy.executor_override_conf`` for cluster runs."""

        def deco(fn: Callable[[PipelineContext], Any]) -> Callable:
            self._add(
                _Task(
                    self._qualify(name),
                    fn,
                    tuple(deps),
                    outputs,
                    trigger_rule,
                    retries,
                    retry_delay_s,
                    on_failure,
                    priority_weight,
                    display_name,
                    sla_s,
                    on_sla_miss,
                    executor_config,
                )
            )
            return fn

        return deco

    def run_shell(
        self,
        name: str,
        command: "str | Callable[[PipelineContext], str]",
        deps: Iterable[str] = (),
        env: dict[str, str] | None = None,
        cwd: str | None = None,
        skip_on_exit_code: int = 99,
        timeout_s: float | None = None,
        *,
        trigger_rule: str = "all_success",
        retries: int = 0,
        retry_delay_s: float = 0.0,
        on_failure: "Callable | None" = None,
        priority_weight: int = 1,
        display_name: str | None = None,
    ) -> str:
        """Subprocess task (≈ BashOperator / @task.bash): run a shell
        command, xcom the LAST non-empty stdout line (the BashOperator
        contract). ``command`` may be a callable built from ctx at run
        time (the @task.bash shape). Exit 0 succeeds; exit
        ``skip_on_exit_code`` skips the task (and cascade-skips
        downstream, ≈ AirflowSkipException); any other exit raises —
        so ``retries`` re-attempt transient failures. Task options
        are spelled out (keyword-only) so a typo raises TypeError
        instead of being silently dropped.
        ``env`` EXTENDS the inherited environment (append_env
        semantics). Driver-side glue only — data-plane work belongs
        in DataFrame tasks, not subprocesses."""
        import subprocess

        qname = self._qualify(name)

        def _run(ctx: PipelineContext) -> str:
            cmd = command(ctx) if callable(command) else command
            proc = subprocess.run(
                cmd,
                shell=True,
                capture_output=True,
                text=True,
                cwd=cwd,
                env={**os.environ, **env} if env else None,
                timeout=timeout_s,
            )
            if proc.returncode == skip_on_exit_code:
                raise TaskSkipped(qname)
            if proc.returncode != 0:
                raise RuntimeError(
                    f"shell task {qname} exited {proc.returncode}: "
                    f"{proc.stderr.strip()[-500:]}"
                )
            lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
            return lines[-1] if lines else ""

        return self._add(
            _Task(
                qname,
                _run,
                tuple(deps),
                trigger_rule=trigger_rule,
                retries=retries,
                retry_delay_s=retry_delay_s,
                on_failure=on_failure,
                priority_weight=priority_weight,
                display_name=display_name,
            )
        )

    def run_python_venv(
        self,
        name: str,
        fn: Callable[..., Any],
        requirements: Iterable[str] = (),
        deps: Iterable[str] = (),
        system_site_packages: bool = True,
        op_kwargs: dict[str, Any] | None = None,
        timeout_s: float | None = None,
        *,
        trigger_rule: str = "all_success",
        retries: int = 0,
        retry_delay_s: float = 0.0,
        on_failure: "Callable | None" = None,
        priority_weight: int = 1,
        display_name: str | None = None,
    ) -> str:
        """Virtualenv-isolated Python task (≈ @task.virtualenv,
        reference dags/tutorial_taskflow_api_virtualenv.py): ``fn``'s
        SOURCE is shipped to a dedicated venv interpreter and executed
        there, so its import environment is the venv's, not the
        driver's. ``requirements`` are pip-installed into the venv at
        first use; venvs are cached per (requirements,
        system_site_packages) so N tasks share one build. The
        return value must be JSON-serializable (the cross-interpreter
        xcom contract — same restriction as the reference operator).

        ``fn`` must be self-contained: module-level names from the
        defining file don't exist in the venv interpreter; do imports
        inside the function (exactly the reference's rule).

        Scale note: this isolates DRIVER-side glue. Executor-side
        Python-dependency isolation for pandas_udfs is a cluster
        submit concern (``--archives venv.tar.gz`` +
        ``spark.pyspark.python``) rendered by deploy.py, not a
        per-task mechanism."""
        import inspect
        import textwrap

        qname = self._qualify(name)
        src = textwrap.dedent(inspect.getsource(fn))
        reqs = tuple(requirements)

        def _run(ctx: PipelineContext) -> Any:
            import json as _json
            import subprocess
            import tempfile

            vpy = _ensure_venv(reqs, system_site_packages)
            payload = _json.dumps(op_kwargs or {})
            script = (
                f"{src}\n"
                f"import json as _j\n"
                f"_res = {fn.__name__}(**_j.loads({payload!r}))\n"
                f"print('__VENV_XCOM__' + _j.dumps(_res))\n"
            )
            with tempfile.NamedTemporaryFile(
                "w", suffix=".py", delete=False
            ) as f:
                f.write(script)
                path = f.name
            try:
                proc = subprocess.run(
                    [vpy, path],
                    capture_output=True,
                    text=True,
                    timeout=timeout_s,
                )
            finally:
                os.unlink(path)
            if proc.returncode != 0:
                raise RuntimeError(
                    f"venv task {qname} exited {proc.returncode}: "
                    f"{proc.stderr.strip()[-500:]}"
                )
            for line in reversed(proc.stdout.splitlines()):
                if line.startswith("__VENV_XCOM__"):
                    return _json.loads(line[len("__VENV_XCOM__"):])
            raise RuntimeError(f"venv task {qname}: no xcom line in stdout")

        return self._add(
            _Task(
                qname,
                _run,
                tuple(deps),
                trigger_rule=trigger_rule,
                retries=retries,
                retry_delay_s=retry_delay_s,
                on_failure=on_failure,
                priority_weight=priority_weight,
                display_name=display_name,
            )
        )

    def describe(self) -> list[dict[str, Any]]:
        """Task metadata in registration order — the UI/graph-view
        surface: name (dependency key), display_name (≈
        task_display_name, defaulting to name), deps, trigger rule,
        retries."""
        return [
            {
                "name": t.name,
                "display_name": t.display_name or t.name,
                "deps": list(t.deps),
                "edge_labels": dict(t.edge_labels or {}),
                "trigger_rule": t.trigger_rule,
                "retries": t.retries,
            }
            for t in (self._tasks[n] for n in self._order)
        ]

    def trigger(
        self,
        name: str,
        target: "Pipeline",
        conf: dict[str, Any] | Callable[[PipelineContext], dict[str, Any]] | None = None,
        deps: Iterable[str] = (),
    ) -> str:
        """≈ TriggerDagRunOperator (example_trigger_controller_dag):
        run ``target`` now with a conf payload (a dict, or a callable
        building it from this run's ctx — the controller's "message").
        The target's finished PipelineContext is this task's xcom, so
        downstream tasks can pull the triggered run's outputs."""
        qname = self._qualify(name)

        def _trig(ctx: PipelineContext) -> PipelineContext:
            payload = conf(ctx) if callable(conf) else (conf or {})
            return target.run(**payload)

        return self._add(_Task(qname, _trig, tuple(deps)))

    def external_task_sensor(
        self,
        name: str,
        external_pipeline: str,
        external_task: str,
        run_key: Any = None,
        deps: Iterable[str] = (),
        **kw: Any,
    ) -> str:
        """≈ ExternalTaskSensor (example_external_task_marker_dag):
        wait until another pipeline's task is recorded complete in
        the shared RunLedger for ``run_key`` (≈ logical date)."""
        if self.ledger is None:
            raise ValueError(f"external_task_sensor {name}: pipeline has no ledger")
        ledger = self.ledger

        def _check(ctx: PipelineContext) -> bool:
            key = run_key if run_key is not None else ctx.params.get("run_date")
            return ledger.is_complete(external_pipeline, external_task, key)

        return self.sensor(name, _check, deps=deps, **kw)

    def external_task_marker(
        self, name: str, deps: Iterable[str] = ()
    ) -> str:
        """≈ ExternalTaskMarker: a no-op task that exists to give
        downstream pipelines a stable (pipeline, task) dependency
        point in the ledger — its completion record IS the contract;
        renaming it breaks consumers, so keep it append-only."""
        return self._add(_Task(self._qualify(name), lambda ctx: True, tuple(deps)))

    def time_delta_sensor(
        self,
        name: str,
        delta_s: float,
        deps: Iterable[str] = (),
        **kw: Any,
    ) -> str:
        """≈ TimeDeltaSensorAsync (example_time_delta_sensor_async):
        wait until ``delta_s`` after the run started. Pass
        ``deferrable=True`` to release the slot between pokes."""

        def _check(ctx: PipelineContext) -> bool:
            return time.monotonic() - ctx.started_at >= delta_s

        kw.setdefault("timeout_s", delta_s + 30.0)
        return self.sensor(name, _check, deps=deps, **kw)

    def run_sql(
        self, name: str, sql: str, deps: Iterable[str] = ()
    ) -> str:
        """SQL task (≈ SQLExecuteQueryOperator over dags/sql/*.sql):
        file path or inline string, executed via spark.sql."""
        def _run(ctx: PipelineContext) -> DataFrame:
            text = sql
            if os.path.exists(sql):
                with open(sql) as f:
                    text = f.read()
            return ctx.spark.sql(text)

        return self._add(_Task(self._qualify(name), _run, tuple(deps)))

    def branch(
        self,
        name: str,
        chooser: Callable[[PipelineContext], str],
        branches: dict[str, Callable[[PipelineContext], Any]],
        deps: Iterable[str] = (),
        labels: dict[str, str] | None = None,
    ) -> list[str]:
        """Conditional plan construction (≈ BranchPythonOperator):
        ``chooser(ctx)`` names one branch; the others are recorded
        as skipped and their downstreams (with the default trigger
        rule) cascade-skip. Returns the branch task names — use them
        as deps; a join task that should run whichever branch was
        taken uses ``trigger_rule="none_failed"``. Each chooser →
        branch edge is labeled with the branch key (override via
        ``labels``, ≈ Label() in example_branch_labels.py), surfaced
        by ``describe()``."""
        qname = self._qualify(name)

        def _choose(ctx: PipelineContext) -> str:
            choice = chooser(ctx)
            if choice not in branches:
                raise ValueError(f"branch {qname}: unknown choice {choice!r}")
            return choice

        self._add(_Task(qname, _choose, tuple(deps)))
        names: list[str] = []
        for key, fn in branches.items():
            bname = f"{qname}.{key}"

            def _branch_fn(
                ctx: PipelineContext,
                _key: str = key,
                _fn: Callable = fn,
            ) -> Any:
                if ctx.pull(qname) != _key:
                    raise TaskSkipped(_key)
                return _fn(ctx)

            self._add(
                _Task(
                    bname,
                    _branch_fn,
                    (qname,),
                    edge_labels={qname: (labels or {}).get(key, key)},
                )
            )
            names.append(bname)
        return names

    def _logical_dt(self, ctx: PipelineContext) -> datetime:
        """The run's logical datetime: the data interval's start when
        scheduled, else the ``run_date`` param, else now (manual
        runs branch on the wall clock, Airflow's own fallback)."""
        if ctx.data_interval is not None:
            return ctx.data_interval.start
        rd = ctx.params.get("run_date")
        if rd is not None:
            return datetime.fromisoformat(str(rd))
        return datetime.now()

    def branch_day_of_week(
        self,
        name: str,
        week_day: str | Iterable[str],
        follow_if_true: Callable[[PipelineContext], Any],
        follow_if_false: Callable[[PipelineContext], Any],
        deps: Iterable[str] = (),
    ) -> list[str]:
        """≈ BranchDayOfWeekOperator (reference
        dags/example_branch_day_of_week_operator.py:40): follow the
        ``true`` branch when the run's logical date falls on
        ``week_day`` (a day name like "Monday", or several). A
        convenience spelling of ``branch`` — same skip/cascade/join
        semantics, edges labeled true/false."""
        days = {week_day} if isinstance(week_day, str) else set(week_day)
        days = {d.strip().lower() for d in days}

        def _chooser(ctx: PipelineContext) -> str:
            dow = self._logical_dt(ctx).strftime("%A").lower()
            return "true" if dow in days else "false"

        return self.branch(
            name,
            chooser=_chooser,
            branches={"true": follow_if_true, "false": follow_if_false},
            deps=deps,
        )

    def branch_datetime(
        self,
        name: str,
        lower: datetime,
        upper: datetime,
        follow_if_in: Callable[[PipelineContext], Any],
        follow_if_out: Callable[[PipelineContext], Any],
        deps: Iterable[str] = (),
    ) -> list[str]:
        """≈ BranchDateTimeOperator (reference
        dags/example_branch_datetime_operator.py:47): follow the
        ``in_window`` branch when the run's logical datetime lies in
        [lower, upper]. Same convenience-over-``branch`` shape as
        ``branch_day_of_week``."""

        def _chooser(ctx: PipelineContext) -> str:
            return (
                "in_window"
                if lower <= self._logical_dt(ctx) <= upper
                else "out_of_window"
            )

        return self.branch(
            name,
            chooser=_chooser,
            branches={
                "in_window": follow_if_in,
                "out_of_window": follow_if_out,
            },
            deps=deps,
        )

    def short_circuit(
        self,
        name: str,
        predicate: Callable[[PipelineContext], bool],
        deps: Iterable[str] = (),
    ) -> str:
        """≈ ShortCircuitOperator: if the predicate is falsy, this
        task and everything downstream of it is skipped."""
        qname = self._qualify(name)

        def _check(ctx: PipelineContext) -> bool:
            if not predicate(ctx):
                raise TaskSkipped(qname)
            return True

        return self._add(_Task(qname, _check, tuple(deps)))

    def latest_only(
        self,
        name: str,
        latest: Callable[[PipelineContext], Any] | None = None,
        deps: Iterable[str] = (),
    ) -> str:
        """≈ LatestOnlyOperator (``example_latest_only.py``): skip
        downstream unless this run processes the latest interval.

        The run is "latest" when ``params['run_date']`` equals
        ``latest(ctx)`` (default: ``params['latest_date']``), or when
        no run_date is set (manual/ad-hoc runs always pass, matching
        Airflow's externally-triggered behavior). Backfill runs set
        run_date < latest_date and everything downstream of this
        task cascade-skips — current-state publishes don't re-run
        for historical partitions.
        """
        qname = self._qualify(name)

        def _gate(ctx: PipelineContext) -> bool:
            run_date = ctx.params.get("run_date")
            if run_date is None:
                return True
            latest_val = (
                latest(ctx) if latest is not None else ctx.params.get("latest_date")
            )
            if latest_val is not None and run_date != latest_val:
                raise TaskSkipped(qname)
            return True

        return self._add(_Task(qname, _gate, tuple(deps)))

    def fan_out(
        self,
        name: str,
        items: Callable[[PipelineContext], list[Any]],
        map_fn: Callable[[PipelineContext, Any], DataFrame],
        deps: Iterable[str] = (),
    ) -> str:
        """≈ dynamic task mapping (``.expand()``): apply ``map_fn``
        per item and union the lazy results by name.

        Spark-first note: in Airflow each mapped task is a separate
        process; here each item contributes a *subplan* and the
        union is one job — Catalyst shares scans between items where
        possible, and at scale the union parallelizes as ordinary
        partitions rather than scheduler tasks.
        """
        qname = self._qualify(name)

        def _map(ctx: PipelineContext) -> DataFrame:
            its = items(ctx)
            if not its:
                raise TaskSkipped(qname)
            dfs = [map_fn(ctx, it) for it in its]
            return reduce(lambda a, b: a.unionByName(b), dfs)

        return self._add(_Task(qname, _map, tuple(deps)))

    def task_group(self, prefix: str) -> "_GroupScope":
        """≈ TaskGroup: namespaces tasks registered inside the
        ``with`` block as ``prefix.name``."""
        return _GroupScope(self, prefix)

    def sensor(
        self,
        name: str,
        check: Callable[[PipelineContext], bool],
        timeout_s: float = 30.0,
        poke_interval_s: float = 0.5,
        deps: Iterable[str] = (),
        mode: str = "timeout_error",  # or "skip" (≈ soft_fail)
        deferrable: bool = False,
        retries: int = 0,
        retry_delay_s: float = 0.0,
    ) -> str:
        """≈ FileSensor / TimeDeltaSensor: poll ``check`` until true
        or timeout. ``mode="skip"`` soft-fails into a skip.
        ``deferrable=True`` (≈ Airflow deferred / mode='reschedule'):
        a false poke raises TaskReschedule instead of sleeping, so
        the runner executes other ready tasks between pokes and only
        sleeps when nothing else can progress. ``retries`` re-arms a
        timed-out sensor with a FRESH poke window per attempt (the
        expired deadline is cleared by the retry path, never reused)."""
        qname = self._qualify(name)

        def _wait_blocking(ctx: PipelineContext) -> bool:
            deadline = time.monotonic() + timeout_s
            while time.monotonic() < deadline:
                if check(ctx):
                    return True
                time.sleep(poke_interval_s)
            if mode == "skip":
                raise TaskSkipped(qname)
            raise SensorTimeout(f"sensor {qname} timed out after {timeout_s}s")

        def _wait_deferrable(ctx: PipelineContext) -> bool:
            now = time.monotonic()
            deadline = ctx.sensor_deadlines.setdefault(qname, now + timeout_s)
            if check(ctx):
                return True
            if now >= deadline:
                if mode == "skip":
                    raise TaskSkipped(qname)
                raise SensorTimeout(f"sensor {qname} timed out after {timeout_s}s")
            raise TaskReschedule(min(now + poke_interval_s, deadline))

        return self._add(
            _Task(
                qname,
                _wait_deferrable if deferrable else _wait_blocking,
                tuple(deps),
                retries=retries,
                retry_delay_s=retry_delay_s,
            )
        )

    def file_sensor(
        self, name: str, path: str, deps: Iterable[str] = (), **kw: Any
    ) -> str:
        """Wait for a path to exist (≈ FileSensor over object
        storage — the availability gate before an ingest task)."""
        return self.sensor(name, lambda ctx: os.path.exists(path), deps=deps, **kw)

    def setup(self, fn: Callable[[PipelineContext], None]) -> Callable:
        self._setup.append(fn)
        return fn

    def teardown(self, fn: Callable[[PipelineContext], None]) -> Callable:
        self._teardown.append(fn)
        return fn

    # -- execution ----------------------------------------------------

    def _toposort(self) -> list[str]:
        seen: set[str] = set()
        out: list[str] = []

        def visit(n: str, stack: tuple[str, ...]) -> None:
            if n in stack:
                raise ValueError(f"cycle at {n}")
            if n in seen:
                return
            for d in self._tasks[n].deps:
                if d not in self._tasks:
                    raise ValueError(f"unknown dep {d} of {n}")
                visit(d, (*stack, n))
            seen.add(n)
            out.append(n)

        for n in self._order:
            visit(n, ())
        return out

    def _run_task(self, ctx: PipelineContext, t: _Task) -> None:
        """One task to completion/skip (propagating TaskReschedule),
        with retries, callbacks, listener events, and ledger/dataset
        records."""
        if t.name not in ctx.attempts:
            self._emit("on_task_started", ctx, t.name)
        t0 = time.monotonic()
        # per-task scheduler-pool routing: every Spark job this task
        # launches lands in its fair-scheduler pool (local property is
        # thread-scoped, so concurrent pipelines don't cross-route)
        pool = (t.executor_config or {}).get("pool")
        sc = self.spark.sparkContext if pool is not None else None
        prev_pool = sc.getLocalProperty("spark.scheduler.pool") if sc else None
        if sc is not None:
            sc.setLocalProperty("spark.scheduler.pool", pool)
        try:
            for attempt in range(t.retries + 1):
                ctx.attempts[t.name] = attempt + 1
                try:
                    ctx.outputs[t.name] = t.fn(ctx)
                    break
                except (TaskSkipped, TaskReschedule):
                    raise
                except Exception as exc:
                    if attempt == t.retries:
                        if t.on_failure is not None:
                            t.on_failure(ctx, exc)
                        self._emit("on_task_failed", ctx, t.name, exc)
                        raise
                    # a deferrable sensor's expired deadline must not
                    # leak into the retry: each attempt gets a fresh
                    # timeout window (parity with blocking sensors)
                    ctx.sensor_deadlines.pop(t.name, None)
                    if t.retry_delay_s:
                        time.sleep(t.retry_delay_s)
        except TaskSkipped:
            ctx.skipped.add(t.name)
            self._emit("on_task_skipped", ctx, t.name)
            return
        finally:
            if sc is not None:  # restore on success, skip, or raise
                sc.setLocalProperty("spark.scheduler.pool", prev_pool)
        duration = time.monotonic() - t0
        if t.sla_s is not None and duration > t.sla_s:
            # SLA miss is an ALERT, not a failure: record + notify,
            # then proceed exactly as a normal success
            ctx.sla_misses.append((t.name, duration, t.sla_s))
            if t.on_sla_miss is not None:
                t.on_sla_miss(ctx, t.name, duration, t.sla_s)
            self._emit("on_task_sla_miss", ctx, t.name, duration, t.sla_s)
        self._emit("on_task_succeeded", ctx, t.name)
        if ctx.registry is not None:
            out = t.outputs_dataset
            if isinstance(out, DatasetAlias):
                # late-bound: publish whatever the task added via
                # ctx.outlet_events[alias].add(Dataset(...)); no
                # events = alias stays unresolved (reference behavior)
                for ds in ctx.outlet_events[out.name].datasets:
                    ctx.registry.publish_via_alias(out.name, ds)
            elif out is not None:
                ctx.registry.publish(out)
        if self.ledger is not None:
            self.ledger.record(self.name, t.name, ctx.params.get("run_date"))

    def _resolve_params(self, overrides: dict[str, Any]) -> dict[str, Any]:
        """Merge declared params with run overrides, validating any
        key declared as a Param (≈ ParamsDict validation on trigger:
        bad values are rejected before any task runs; defaults apply
        when no override is given; tasks always see plain values)."""
        resolved: dict[str, Any] = {}
        for k, decl in self.params.items():
            if isinstance(decl, Param):
                if k in overrides:
                    resolved[k] = decl.validate(k, overrides[k])
                elif decl.default is not None or decl.type is None:
                    resolved[k] = decl.default
                else:
                    raise ParamValidationError(f"param {k}: required, no default")
            else:
                resolved[k] = overrides.get(k, decl)
        for k, v in overrides.items():
            if k not in self.params:
                resolved[k] = v  # undeclared ad-hoc params pass through
        return resolved

    def run(self, **params: Any) -> PipelineContext:
        ctx = PipelineContext(
            spark=self.spark,
            params=self._resolve_params(params),
            registry=self.registry,
        )
        for setup_fn in self._setup:
            setup_fn(ctx)
        self._emit("on_pipeline_started", ctx)
        order = self._toposort()
        topo_idx = {n: i for i, n in enumerate(order)}
        pending = dict.fromkeys(order)  # insertion-ordered set
        next_poke: dict[str, float] = {}  # deferred sensors awaiting re-poke
        try:
            while pending:
                # ready = all deps resolved; highest priority first,
                # topo order as the deterministic tie-break
                ready = [
                    n
                    for n in pending
                    if all(d not in pending for d in self._tasks[n].deps)
                ]
                ready.sort(
                    key=lambda n: (-self._tasks[n].priority_weight, topo_idx[n])
                )
                progressed = False
                for name in ready:
                    if name in next_poke and time.monotonic() < next_poke[name]:
                        continue
                    t = self._tasks[name]
                    if (
                        any(d in ctx.skipped for d in t.deps)
                        and t.trigger_rule == "all_success"
                    ):
                        ctx.skipped.add(name)
                        self._emit("on_task_skipped", ctx, name)
                        del pending[name]
                        progressed = True
                        continue
                    try:
                        self._run_task(ctx, t)
                    except TaskReschedule as r:
                        next_poke[name] = r.next_poke_at
                        continue
                    next_poke.pop(name, None)
                    del pending[name]
                    progressed = True
                if not progressed:
                    waiting = [next_poke[n] for n in pending if n in next_poke]
                    if not waiting:  # defensive: toposort precludes this
                        raise ValueError(f"pipeline {self.name}: no runnable task")
                    time.sleep(max(0.0, min(waiting) - time.monotonic()))
        finally:
            self._emit("on_pipeline_finished", ctx)
            for teardown_fn in self._teardown:
                teardown_fn(ctx)
        return ctx

    # -- scheduling (≈ DAG(schedule=...), catchup/backfill) -----------

    def next_run_after(self, ts: datetime) -> datetime | None:
        """When the timetable would next fire after ``ts``."""
        if self.timetable is None:
            return None
        return self.timetable.next_run_after(ts)

    def run_backfill(
        self,
        earliest: datetime,
        latest: datetime,
        catchup: bool = True,
        **params: Any,
    ) -> list[PipelineContext]:
        """Enumerate the timetable's data intervals in (earliest,
        latest] and run once per interval, oldest first (Airflow
        backfill ordering). Each run gets ``run_date`` = interval
        start and ``latest_date`` = the final interval's start, so
        ``latest_only()`` gates skip current-state publishes on all
        but the last window. ``catchup=False`` runs only the latest
        interval."""
        if self.timetable is None:
            raise ValueError(f"pipeline {self.name}: no schedule to backfill")
        windows = list(self.timetable.windows_between(earliest, latest, catchup))
        if not windows:
            return []
        latest_date = windows[-1].start
        out: list[PipelineContext] = []
        for iv in windows:
            ctx = self.run(run_date=iv.start, latest_date=latest_date, **params)
            ctx.data_interval = iv
            out.append(ctx)
        return out


class _GroupScope:
    def __init__(self, pipeline: Pipeline, prefix: str) -> None:
        self._pipeline = pipeline
        self._prefix = prefix

    def __enter__(self) -> Pipeline:
        self._pipeline._group_prefix.append(self._prefix)
        return self._pipeline

    def __exit__(self, *exc: Any) -> None:
        self._pipeline._group_prefix.pop()


# -- virtualenv task support (≈ @task.virtualenv) ---------------------

# (requirements, system_site_packages) -> venv python path; venv
# builds are expensive, so every task with the same spec shares one
_VENV_CACHE: dict[tuple, str] = {}


def _pip_install_args(venv_python: str, requirements: tuple) -> list[str]:
    """The exact pip invocation a requirements list compiles to —
    split out so the rendering is unit-testable without a network."""
    return [venv_python, "-m", "pip", "install", "--quiet", *requirements]


def _ensure_venv(requirements: tuple, system_site_packages: bool) -> str:
    """Build (or reuse) the venv for a requirements spec; returns its
    interpreter path. No-requirements venvs skip the pip bootstrap
    entirely (--without-pip) — isolation without the ~5 s ensurepip
    cost."""
    import subprocess
    import sys as _sys

    from etl_gov_spark.io.scratch import scratch_dir

    key = (requirements, system_site_packages)
    if key in _VENV_CACHE:
        return _VENV_CACHE[key]
    venv_dir = scratch_dir("venv")
    cmd = [_sys.executable, "-m", "venv"]
    if system_site_packages:
        cmd.append("--system-site-packages")
    if not requirements:
        cmd.append("--without-pip")
    subprocess.run([*cmd, venv_dir], check=True, capture_output=True)
    vpy = os.path.join(venv_dir, "bin", "python")
    if requirements:
        proc = subprocess.run(
            _pip_install_args(vpy, requirements), capture_output=True, text=True
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"venv pip install {list(requirements)} failed: "
                f"{proc.stderr.strip()[-500:]}"
            )
    _VENV_CACHE[key] = vpy
    return vpy
