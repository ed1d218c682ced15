"""Pipeline DSL semantics — the Spark analogue of the reference's
example DAGs (branch/short-circuit/mapping/groups/sensors/datasets/
setup-teardown/xcom), each capability exercised the way the matching
example DAG exercises it."""

from __future__ import annotations

import pytest

from etl_gov_spark.pipeline.core import (
    Dataset,
    DatasetRegistry,
    Pipeline,
    SensorTimeout,
)


def test_task_chain_and_xcom(spark):
    p = Pipeline("chain", spark)

    @p.task("a")
    def a(ctx):
        return 41

    @p.task("b", deps=["a"])
    def b(ctx):
        return ctx.pull("a") + 1

    ctx = p.run()
    assert ctx.pull("b") == 42


def test_branch_skips_untaken_and_cascades(spark):
    p = Pipeline("branching", spark)
    taken = p.branch(
        "route",
        chooser=lambda ctx: "left",
        branches={"left": lambda ctx: "L", "right": lambda ctx: "R"},
    )
    assert taken == ["route.left", "route.right"]

    @p.task("after_right", deps=["route.right"])
    def after_right(ctx):
        return "should not run"

    @p.task("join", deps=["route.left", "route.right"], trigger_rule="none_failed")
    def join(ctx):
        return "joined"

    ctx = p.run()
    assert ctx.pull("route.left") == "L"
    assert "route.right" in ctx.skipped
    assert "after_right" in ctx.skipped  # cascade
    assert ctx.pull("join") == "joined"  # none_failed runs anyway


def test_short_circuit_skips_downstream(spark):
    p = Pipeline("sc", spark)
    p.short_circuit("gate", predicate=lambda ctx: ctx.params.get("go", False))

    @p.task("work", deps=["gate"])
    def work(ctx):
        return "did work"

    assert "work" in p.run().skipped
    assert p.run(go=True).pull("work") == "did work"


def test_fan_out_unions_subplans(spark):
    p = Pipeline("fan", spark)
    p.fan_out(
        "per_status",
        items=lambda ctx: ["F", "O", "P"],
        map_fn=lambda ctx, s: ctx.spark.range(2).withColumn(
            "status", __import__("pyspark").sql.functions.lit(s)
        ),
    )
    df = p.run().pull("per_status")
    rows = df.collect()
    assert len(rows) == 6
    assert {r.status for r in rows} == {"F", "O", "P"}


def test_task_group_namespacing(spark):
    p = Pipeline("groups", spark)
    with p.task_group("ingest"):

        @p.task("x")
        def x(ctx):
            return 1

    @p.task("use", deps=["ingest.x"])
    def use(ctx):
        return ctx.pull("ingest.x") + 1

    assert p.run().pull("use") == 2


def test_sensor_success_and_timeout(spark, tmp_path):
    target = tmp_path / "marker"
    p = Pipeline("sensors", spark)
    p.file_sensor("wait", str(target), timeout_s=1.0, poke_interval_s=0.05)
    with pytest.raises(SensorTimeout):
        p.run()
    target.write_text("here")
    assert p.run().pull("wait") is True


def test_sensor_soft_fail_skips(spark):
    p = Pipeline("soft", spark)
    p.sensor("never", check=lambda ctx: False, timeout_s=0.2, poke_interval_s=0.05, mode="skip")

    @p.task("down", deps=["never"])
    def down(ctx):
        return 1

    ctx = p.run()
    assert {"never", "down"} <= ctx.skipped


def test_dataset_publish_and_subscribe(spark):
    reg = DatasetRegistry()
    seen = []
    reg.subscribe("gold", lambda ds, v: seen.append((ds.name, v)))
    p = Pipeline("ds", spark, registry=reg)

    @p.task("produce", outputs=Dataset("gold"))
    def produce(ctx):
        return "data"

    p.run()
    p.run()
    assert reg.version("gold") == 2
    assert seen == [("gold", 1), ("gold", 2)]
    assert reg.is_fresher_than("gold", 1)


def test_setup_teardown_run_even_on_failure(spark):
    p = Pipeline("life", spark)
    log = []
    p.setup(lambda ctx: log.append("setup"))
    p.teardown(lambda ctx: log.append("teardown"))

    @p.task("boom")
    def boom(ctx):
        raise RuntimeError("x")

    with pytest.raises(RuntimeError):
        p.run()
    assert log == ["setup", "teardown"]


def test_run_sql_inline_and_cycle_detection(spark):
    p = Pipeline("sql", spark)
    p.run_sql("q", "SELECT 1 AS one")
    assert p.run().pull("q").collect()[0].one == 1

    p2 = Pipeline("cycle", spark)

    @p2.task("a", deps=["b"])
    def a(ctx):
        return 1

    @p2.task("b", deps=["a"])
    def b(ctx):
        return 2

    with pytest.raises(ValueError, match="cycle"):
        p2.run()


def test_latest_only_gates_backfill_runs(spark):
    """≈ example_latest_only.py: backfills skip the publish leg."""

    def build():
        p = Pipeline("lo", spark)

        @p.task("etl")
        def etl(ctx):
            return "transformed"

        gate = p.latest_only("gate", deps=["etl"])

        @p.task("publish", deps=[gate])
        def publish(ctx):
            return "published"

        return p

    # latest run: publish executes
    ctx = build().run(run_date="2024-01-30", latest_date="2024-01-30")
    assert ctx.pull("publish") == "published"
    # backfill run: gate and publish cascade-skip, etl still ran
    ctx = build().run(run_date="2024-01-05", latest_date="2024-01-30")
    assert "gate" in ctx.skipped and "publish" in ctx.skipped
    assert ctx.pull("etl") == "transformed"
    # manual run with no run_date: treated as latest
    ctx = build().run()
    assert ctx.pull("publish") == "published"


def test_trigger_runs_target_with_conf(spark):
    """≈ example_trigger_controller_dag → example_trigger_target_dag:
    the controller triggers the target now, passing a conf payload;
    the target's run context is the controller task's xcom."""
    target = Pipeline("target", spark)

    @target.task("receive")
    def receive(ctx):
        return f"got: {ctx.params.get('message', '<none>')}"

    controller = Pipeline("controller", spark)

    @controller.task("prepare")
    def prepare(ctx):
        return "hello from controller"

    controller.trigger(
        "fire", target, conf=lambda ctx: {"message": ctx.pull("prepare")},
        deps=["prepare"],
    )

    @controller.task("inspect", deps=["fire"])
    def inspect(ctx):
        return ctx.pull("fire").pull("receive")

    ctx = controller.run()
    assert ctx.pull("inspect") == "got: hello from controller"


def test_external_task_sensor_fires_and_times_out(spark):
    """≈ example_external_task_marker_dag: the child pipeline waits
    on the parent's marker task for the same run_key; unseen keys
    time out."""
    from etl_gov_spark.pipeline.core import RunLedger

    ledger = RunLedger()
    parent = Pipeline("parent", spark, ledger=ledger)

    @parent.task("work")
    def work(ctx):
        return 1

    parent.external_task_marker("handoff", deps=["work"])

    child = Pipeline("child", spark, ledger=ledger)
    child.external_task_sensor(
        "wait_parent", "parent", "handoff",
        timeout_s=0.3, poke_interval_s=0.05,
    )

    @child.task("consume", deps=["wait_parent"])
    def consume(ctx):
        return "consumed"

    # parent hasn't run for this run_date → sensor times out
    with pytest.raises(SensorTimeout):
        child.run(run_date="2024-06-01")
    # parent completes the same logical date → sensor fires
    parent.run(run_date="2024-06-01")
    assert child.run(run_date="2024-06-01").pull("consume") == "consumed"
    # a different logical date is still not satisfied
    with pytest.raises(SensorTimeout):
        child.run(run_date="2024-06-02")


def test_listeners_fire_in_order_across_branch_and_skip(spark):
    """≈ plugins/event_listener.py: start/success/skip/finish events
    observed in execution order, including cascade-skips."""
    from etl_gov_spark.pipeline.core import PipelineListener

    p = Pipeline("listened", spark)
    events: list[tuple[str, str]] = []
    p.add_listener(
        PipelineListener(
            on_pipeline_started=lambda ctx: events.append(("pipeline", "start")),
            on_pipeline_finished=lambda ctx: events.append(("pipeline", "finish")),
            on_task_started=lambda ctx, n: events.append((n, "start")),
            on_task_succeeded=lambda ctx, n: events.append((n, "success")),
            on_task_skipped=lambda ctx, n: events.append((n, "skip")),
        )
    )
    p.branch(
        "route",
        chooser=lambda ctx: "left",
        branches={"left": lambda ctx: "L", "right": lambda ctx: "R"},
    )

    @p.task("after_right", deps=["route.right"])
    def after_right(ctx):
        return "never"

    p.run()
    assert events[0] == ("pipeline", "start") and events[-1] == ("pipeline", "finish")
    assert ("route", "success") in events
    assert ("route.left", "success") in events
    assert ("route.right", "skip") in events
    assert ("after_right", "skip") in events  # cascade-skip also emits
    # started fires before its own success
    assert events.index(("route.left", "start")) < events.index(("route.left", "success"))


def test_listener_failure_event(spark):
    from etl_gov_spark.pipeline.core import PipelineListener

    p = Pipeline("listen-fail", spark)
    seen = []
    p.add_listener(
        PipelineListener(on_task_failed=lambda ctx, n, exc: seen.append((n, str(exc))))
    )

    @p.task("boom")
    def boom(ctx):
        raise RuntimeError("bang")

    with pytest.raises(RuntimeError):
        p.run()
    assert seen == [("boom", "bang")]


def test_deferrable_sensor_releases_slot_between_pokes(spark, tmp_path):
    """≈ example_time_delta_sensor_async: a deferred sensor must not
    block other ready tasks — the independent task completes while
    the sensor is still waiting, even though the sensor registered
    first."""
    marker = tmp_path / "flag"
    p = Pipeline("deferred", spark)
    order: list[str] = []

    def check(ctx):
        done = marker.exists()
        if not done and "other" in order:
            marker.write_text("x")  # condition appears after 'other' ran
        return done

    p.sensor("gate", check, timeout_s=5.0, poke_interval_s=0.05, deferrable=True)

    @p.task("other")  # independent: no deps on the sensor
    def other(ctx):
        order.append("other")
        return 1

    @p.task("after", deps=["gate"])
    def after(ctx):
        order.append("after")
        return 2

    ctx = p.run()
    # 'other' ran during the sensor's wait, not after it
    assert order == ["other", "after"]
    assert ctx.pull("gate") is True


def test_deferrable_sensor_timeout_and_skip_modes(spark):
    p = Pipeline("deferred-timeout", spark)
    p.sensor("never", lambda ctx: False, timeout_s=0.2, poke_interval_s=0.05,
             deferrable=True)
    with pytest.raises(SensorTimeout):
        p.run()

    p2 = Pipeline("deferred-skip", spark)
    p2.sensor("never", lambda ctx: False, timeout_s=0.2, poke_interval_s=0.05,
              deferrable=True, mode="skip")

    @p2.task("down", deps=["never"])
    def down(ctx):
        return 1

    ctx = p2.run()
    assert {"never", "down"} <= ctx.skipped


def test_deferrable_sensor_retry_gets_fresh_timeout_window(spark):
    """A deferrable sensor's expired deadline must not leak into its
    retry: with retries=1, the second attempt re-polls a full fresh
    window (parity with example_time_delta_sensor_async semantics —
    each attempt gets its own poke window) instead of instantly
    re-raising SensorTimeout against the stale deadline."""
    import time as _time

    p = Pipeline("deferred-retry", spark)
    t0 = _time.monotonic()

    # False for 0.3s — longer than one 0.2s window, shorter than two.
    p.sensor(
        "gate",
        lambda ctx: _time.monotonic() - t0 >= 0.3,
        timeout_s=0.2,
        poke_interval_s=0.05,
        deferrable=True,
        retries=1,
    )

    ctx = p.run()
    assert ctx.pull("gate") is True
    # the first window really did expire before the condition held
    assert _time.monotonic() - t0 >= 0.3


def test_time_delta_sensor_waits_out_the_delta(spark):
    import time as _time

    p = Pipeline("delta", spark)
    p.time_delta_sensor("pause", 0.3, poke_interval_s=0.05, deferrable=True)

    @p.task("after", deps=["pause"])
    def after(ctx):
        return _time.monotonic()

    ctx = p.run()
    assert ctx.pull("after") - ctx.started_at >= 0.3


def test_priority_weight_orders_ready_tasks(spark):
    """≈ plugins/decreasing_priority_weight_strategy.py: among ready
    tasks the higher weight runs first; default weights keep
    registration (topo) order."""
    p = Pipeline("prio", spark)
    order: list[str] = []

    @p.task("low", priority_weight=1)
    def low(ctx):
        order.append("low")

    @p.task("high", priority_weight=10)
    def high(ctx):
        order.append("high")

    p.run()
    assert order == ["high", "low"]


def test_salted_join_scatters_hot_keys(spark, sf_dir):
    """Each hot key must spread across several salt sub-keys, and
    the salted result must equal the plain join row-for-row."""
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.skew import salted_join

    ev = Catalog(spark, sf_dir).events.select("event_type", "value")
    dim = ev.select("event_type").distinct().withColumn("w", F.lit(1.0))
    salted = salted_join(ev, dim, on="event_type", n_salts=8)
    assert salted.columns == ["event_type", "value", "w"]
    assert salted.count() == ev.count()
    # distribution: every hot key uses >1 salt bucket
    spread = (
        ev.withColumn("_salt", F.pmod(F.xxhash64("event_type", "value"), F.lit(8)))
        .groupBy("event_type")
        .agg(F.countDistinct("_salt").alias("n_salts"))
        .collect()
    )
    assert all(r.n_salts > 4 for r in spread)


def test_task_retries_then_succeeds(spark):
    from etl_gov_spark.pipeline.core import Pipeline

    p = Pipeline("retry-demo", spark)
    calls = {"n": 0}

    @p.task("flaky", retries=2)
    def flaky(ctx):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    ctx = p.run()
    assert ctx.outputs["flaky"] == "ok"
    assert calls["n"] == 3
    assert ctx.attempts["flaky"] == 3


def test_task_failure_callback_fires_once_then_aborts(spark):
    import pytest

    from etl_gov_spark.pipeline.core import Pipeline

    p = Pipeline("fail-demo", spark)
    seen = []

    @p.task("doomed", retries=1, on_failure=lambda ctx, exc: seen.append(str(exc)))
    def doomed(ctx):
        raise RuntimeError("permanent")

    @p.task("downstream", deps=("doomed",))
    def downstream(ctx):
        return "never"

    with pytest.raises(RuntimeError, match="permanent"):
        p.run()
    assert seen == ["permanent"]  # callback once, after final attempt


def test_run_shell_xcom_skip_and_env(spark, tmp_path):
    """≈ example_bash_operator / @task.bash: the xcom is the last
    non-empty stdout line, exit 99 soft-skips the task and cascades,
    env extends (not replaces) the inherited environment, and a
    callable command is rendered from ctx at run time."""
    from etl_gov_spark.pipeline.core import Pipeline

    p = Pipeline("shellish", spark, params={"who": "gov"})
    p.run_shell("greet", 'echo first line && echo "hello $WHO"', env={"WHO": "spark"})
    p.run_shell(
        "templated",
        lambda ctx: f"echo run-for-{ctx.params['who']}",
        deps=["greet"],
    )
    p.run_shell("maybe_skip", "exit 99", deps=["templated"])

    @p.task("after_skip", deps=["maybe_skip"])
    def after_skip(ctx):
        return "never"

    ctx = p.run()
    assert ctx.outputs["greet"] == "hello spark"
    assert ctx.outputs["templated"] == "run-for-gov"
    assert {"maybe_skip", "after_skip"} <= ctx.skipped


def test_run_shell_failure_raises_with_stderr(spark):
    import pytest

    from etl_gov_spark.pipeline.core import Pipeline

    p = Pipeline("shell-fail", spark)
    p.run_shell("boom", "echo oops >&2; exit 3")
    with pytest.raises(RuntimeError, match="exited 3.*oops"):
        p.run()


def test_display_names_surface_in_describe(spark):
    """≈ example_display_name: dag_display_name / task_display_name
    are labels only — the task NAME stays the dependency key."""
    from etl_gov_spark.pipeline.core import Pipeline

    p = Pipeline("disp", spark, display_name="Sample DAG with Display Name")
    assert p.display_name == "Sample DAG with Display Name"

    @p.task("sample_task_1", display_name="Sample Task 1")
    def one(ctx):
        return 1

    @p.task("sample_task_2", deps=["sample_task_1"])
    def two(ctx):
        return 2

    meta = {d["name"]: d for d in p.describe()}
    assert meta["sample_task_1"]["display_name"] == "Sample Task 1"
    assert meta["sample_task_2"]["display_name"] == "sample_task_2"  # default
    assert meta["sample_task_2"]["deps"] == ["sample_task_1"]
    ctx = p.run()
    assert ctx.outputs["sample_task_2"] == 2


def test_sla_miss_fires_without_failing_run(spark):
    """≈ reference dags/example_sla_dag.py: a task that SUCCEEDS but
    overruns its sla_s fires the task-level on_sla_miss callback and
    the listener's on_task_sla_miss event, lands on ctx.sla_misses —
    and the run still completes with both tasks green."""
    import time as _time

    from etl_gov_spark.pipeline.core import PipelineListener

    p = Pipeline("sla", spark)
    cb_hits: list[tuple[str, float, float]] = []
    lis_hits: list[str] = []
    p.add_listener(
        PipelineListener(
            on_task_sla_miss=lambda ctx, n, d, s: lis_hits.append(n)
        )
    )

    @p.task(
        "slow",
        sla_s=0.01,
        on_sla_miss=lambda ctx, n, d, s: cb_hits.append((n, d, s)),
    )
    def slow(ctx):
        _time.sleep(0.05)
        return "done"

    @p.task("fast", deps=["slow"], sla_s=60.0)
    def fast(ctx):
        return ctx.pull("slow") + "!"

    ctx = p.run()
    assert ctx.pull("fast") == "done!"  # nothing failed or skipped
    assert lis_hits == ["slow"]
    assert [(n, s) for n, d, s in cb_hits] == [("slow", 0.01)]
    assert [(n, s) for n, d, s in ctx.sla_misses] == [("slow", 0.01)]
    assert all(d > 0.01 for _, d, _ in ctx.sla_misses)


def test_run_python_venv_isolated_interpreter(spark):
    """≈ tutorial_taskflow_api_virtualenv.py: the task body runs in a
    SEPARATE venv interpreter (different sys.prefix), gets op_kwargs,
    and returns a JSON xcom the next task pulls."""
    import sys as _sys

    p = Pipeline("venvpipe", spark)

    def probe(factor):
        import sys

        return {"prefix": sys.prefix, "answer": 21 * factor}

    p.run_python_venv("probe", probe, op_kwargs={"factor": 2})

    @p.task("consume", deps=["probe"])
    def consume(ctx):
        return ctx.pull("probe")["answer"]

    ctx = p.run()
    assert ctx.pull("consume") == 42
    # ran under the venv prefix, not the driver's interpreter
    assert ctx.pull("probe")["prefix"] != _sys.prefix


def test_run_python_venv_requirements_render_and_cache():
    """The requirements list compiles to the exact pip invocation
    (unit-tested without a network), and identical specs share one
    cached venv build."""
    from etl_gov_spark.pipeline.core import (
        _VENV_CACHE,
        _ensure_venv,
        _pip_install_args,
    )

    assert _pip_install_args("/v/bin/python", ("pandas==2.2", "pyyaml"))[
        1:
    ] == ["-m", "pip", "install", "--quiet", "pandas==2.2", "pyyaml"]
    a = _ensure_venv((), True)
    b = _ensure_venv((), True)
    assert a == b and ((), True) in _VENV_CACHE


def test_executor_config_pool_routes_spark_jobs(spark):
    """≈ example_kubernetes_executor.py executor_config: a task with
    executor_config={"pool": ...} runs its Spark jobs under that
    fair-scheduler pool (thread-local property), and the property is
    restored afterwards."""
    p = Pipeline("routed", spark)
    seen: dict[str, str | None] = {}

    @p.task("heavy", executor_config={"pool": "heavy_pool"})
    def heavy(ctx):
        seen["during"] = ctx.spark.sparkContext.getLocalProperty(
            "spark.scheduler.pool"
        )
        return ctx.spark.range(10).count()  # a real job under the pool

    @p.task("normal", deps=["heavy"])
    def normal(ctx):
        seen["after"] = ctx.spark.sparkContext.getLocalProperty(
            "spark.scheduler.pool"
        )
        return ctx.pull("heavy")

    ctx = p.run()
    assert ctx.pull("normal") == 10
    assert seen["during"] == "heavy_pool"
    assert seen["after"] in (None, "")  # restored


def test_executor_override_conf_rendering():
    """Per-task executor_config → submit confs, pure and validated."""
    import pytest as _pytest

    from etl_gov_spark.deploy import executor_override_conf, submit_command

    conf = executor_override_conf(
        {
            "cpus": 8,
            "memory_gb": 32,
            "gpus": 1,
            "pool": "gpu_pool",
            "node_selector": {"accel": "a100"},
        }
    )
    assert conf["spark.executor.cores"] == "8"
    assert conf["spark.kubernetes.executor.request.cores"] == "8"
    assert conf["spark.executor.memory"] == "32768m"
    assert conf["spark.executor.memoryOverhead"] == "3276m"
    assert conf["spark.executor.resource.gpu.amount"] == "1"
    assert conf["spark.scheduler.pool"] == "gpu_pool"
    assert conf["spark.kubernetes.node.selector.accel"] == "a100"
    with _pytest.raises(ValueError, match="cpu_count"):
        executor_override_conf({"cpu_count": 4})
    # overrides win over the sizing plan in a rendered submit (the
    # per-task app shape)
    from etl_gov_spark.deploy import REFERENCE_SHAPE, size_executors

    plan = size_executors(REFERENCE_SHAPE)
    argv = submit_command(
        "job.py", "yarn", plan, extra_conf=executor_override_conf({"cpus": 8})
    )
    assert "--conf" in argv and "spark.executor.cores=8" in argv


def test_branch_edges_labeled_in_describe(spark):
    """branch() labels each chooser→branch edge with the branch key
    (override via labels=), surfaced by describe() — the
    example_branch_labels.py graph-view annotation."""
    p = Pipeline("labeled", spark)
    p.branch(
        "route",
        chooser=lambda ctx: "yes",
        branches={"yes": lambda ctx: 1, "no": lambda ctx: 0},
        labels={"no": "skip it"},
    )
    meta = {t["name"]: t for t in p.describe()}
    assert meta["route.yes"]["edge_labels"] == {"route": "yes"}
    assert meta["route.no"]["edge_labels"] == {"route": "skip it"}
    assert meta["route"]["edge_labels"] == {}


def test_branch_day_of_week(spark):
    """branch_day_of_week follows true exactly on the named weekday
    of the run's logical date (2024-01-01 was a Monday)."""
    p = Pipeline("dow", spark)
    p.branch_day_of_week(
        "weekly",
        week_day="Monday",
        follow_if_true=lambda ctx: "monday work",
        follow_if_false=lambda ctx: "weekday work",
    )
    ctx = p.run(run_date="2024-01-01")
    assert ctx.pull("weekly.true") == "monday work"
    assert "weekly.false" in ctx.skipped

    p2 = Pipeline("dow2", spark)
    p2.branch_day_of_week(
        "weekly",
        week_day=["Saturday", "Sunday"],
        follow_if_true=lambda ctx: "weekend",
        follow_if_false=lambda ctx: "weekday",
    )
    ctx2 = p2.run(run_date="2024-01-02")  # a Tuesday
    assert ctx2.pull("weekly.false") == "weekday"
    assert "weekly.true" in ctx2.skipped


def test_branch_datetime_window(spark):
    """branch_datetime follows in_window iff the logical datetime
    falls inside [lower, upper]."""
    from datetime import datetime

    lower = datetime(2024, 6, 1)
    upper = datetime(2024, 6, 30, 23, 59)
    for run_date, taken, skipped in [
        ("2024-06-15", "in_window", "out_of_window"),
        ("2024-07-15", "out_of_window", "in_window"),
    ]:
        p = Pipeline("dt", spark)
        p.branch_datetime(
            "window",
            lower=lower,
            upper=upper,
            follow_if_in=lambda ctx: "in",
            follow_if_out=lambda ctx: "out",
        )
        ctx = p.run(run_date=run_date)
        assert f"window.{skipped}" in ctx.skipped
        ctx.pull(f"window.{taken}")


def test_crawl_prep_funnel(spark, sf_dir):
    """pipeline_crawl_prep: the archive layer yields exactly 3 WARC
    records per document (warcinfo/request/response), response
    extraction is lossless (doc and token counts equal the raw
    corpus), url-dedup keeps exactly one capture per canonical URL,
    and the document funnel only shrinks through url_dedup →
    langid → gopher → dedup."""
    from collections import defaultdict

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.pipeline.demo import pipeline_crawl_prep

    rows = pipeline_crawl_prep(spark, sf_dir).collect()
    by = defaultdict(dict)
    for r in rows:
        by[r.stage][r.source] = r
    docs = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .count()
        .collect()
    )
    n_by_src = {r.source: r["count"] for r in docs}
    assert set(by["00_records"]) == set(n_by_src)
    for src, n in n_by_src.items():
        rec = by["00_records"][src]
        assert rec.n_records == 3 * n and rec.n_docs == n
        resp = by["01_responses"][src]
        assert resp.n_docs == n and resp.n_tokens > 0
    # funnel only shrinks, per source
    for src in n_by_src:
        chain = [
            by[s].get(src)
            for s in (
                "01_responses",
                "02_url_dedup",
                "03_langid",
                "04_gopher",
                "05_dedup",
            )
        ]
        counts = [c.n_docs for c in chain if c is not None]
        assert counts == sorted(counts, reverse=True) or all(
            a >= b for a, b in zip(counts, counts[1:])
        )
    tot = lambda s: sum(r.n_docs for r in by[s].values())  # noqa: E731
    # url-dedup keeps exactly one capture per canonical URL: pages
    # group every 3 consecutive doc_ids, so the corpus-wide keep
    # count equals the number of distinct page groups
    n_total = sum(n_by_src.values())
    assert tot("02_url_dedup") == (n_total + 2) // 3
    # langid actually cut something corpus-wide (multi-lang corpus)
    assert tot("03_langid") < tot("02_url_dedup")
    assert tot("05_dedup") <= tot("04_gopher") <= tot("03_langid")
