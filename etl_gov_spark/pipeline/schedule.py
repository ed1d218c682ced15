"""Timetables: time-based scheduling for the pipeline DSL (SURVEY §2.G).

Capability parity with the reference's schedule machinery:
- ``dags/tutorial_dag.py:39`` (``schedule="@daily"`` / cron strings)
  → ``CronTimetable`` / ``parse_schedule``.
- ``dags/plugins/workday.py:1`` (``AfterWorkdayTimetable``) used by
  ``dags/example_workday_timetable.py:1`` → ``WorkdayTimetable``
  (skips weekends + holidays; holiday source is an explicit set, with
  an optional pandas USFederalHolidayCalendar hookup mirroring the
  reference's import-gated fallback).
- catchup/backfill window enumeration (``DAG(catchup=...)``)
  → ``Timetable.windows_between`` + ``Pipeline.run_backfill``.

Spark-first note: a timetable is pure driver-side arithmetic — it
computes *which data intervals exist*, and each interval becomes one
``Pipeline.run(run_date=...)`` whose tasks wire lazy DataFrames. At
cluster scale the same windows shard a backfill across job
submissions; nothing here touches executors.

All arithmetic is in naive UTC datetimes (the testdata convention).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date, datetime, time as dtime, timedelta
from typing import Iterator

__all__ = [
    "DataInterval",
    "Timetable",
    "CronTimetable",
    "IntervalTimetable",
    "WorkdayTimetable",
    "parse_schedule",
]


@dataclass(frozen=True)
class DataInterval:
    """The [start, end) window of data a run covers (≈ Airflow
    DataInterval). ``run_date`` (== start) is what flows into
    ``Pipeline.run(run_date=...)`` and the latest_only gate."""

    start: datetime
    end: datetime

    @property
    def run_date(self) -> datetime:
        return self.start


class Timetable:
    """Protocol: subclasses implement ``next_interval_after(ts)``."""

    def next_interval_after(self, ts: datetime) -> DataInterval | None:
        """First interval whose start is strictly after ``ts`` (None =
        never, e.g. past an end bound)."""
        raise NotImplementedError

    def next_run_after(self, ts: datetime) -> datetime | None:
        iv = self.next_interval_after(ts)
        return iv.start if iv is not None else None

    def windows_between(
        self, earliest: datetime, latest: datetime, catchup: bool = True
    ) -> Iterator[DataInterval]:
        """Enumerate scheduled intervals with start in (earliest,
        latest] in order — the backfill window list. ``catchup=False``
        yields only the final window (Airflow's catchup=False runs
        just the latest interval)."""
        out: list[DataInterval] = []
        ts = earliest
        while True:
            iv = self.next_interval_after(ts)
            if iv is None or iv.start > latest:
                break
            out.append(iv)
            ts = iv.start
        if not catchup and out:
            out = out[-1:]
        yield from out


_CRON_BOUNDS = ((0, 59), (0, 23), (1, 31), (1, 12), (0, 6))  # min h dom mon dow


def _parse_field(spec: str, lo: int, hi: int, dow: bool = False) -> frozenset[int]:
    vals: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"cron step must be positive: {spec!r}")
        if part == "*":
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = int(a_s), int(b_s)
        else:
            a = b = int(part)
        if dow:  # cron allows 7 == Sunday == 0
            a, b = (0 if a == 7 else a), (0 if b == 7 else b)
        if not (lo <= a <= hi and lo <= b <= hi):
            raise ValueError(f"cron field out of range [{lo},{hi}]: {spec!r}")
        vals.update(range(a, b + 1, step))
    return frozenset(vals)


class CronTimetable(Timetable):
    """Standard 5-field cron (minute hour day-of-month month
    day-of-week; dow 0=Sunday, 7 accepted as Sunday). Follows the
    classic rule: when BOTH dom and dow are restricted the day
    matches on either (vixie-cron OR semantics). The produced data
    interval spans [this fire, next fire) — Airflow's convention."""

    def __init__(self, expr: str) -> None:
        fields = expr.split()
        if len(fields) != 5:
            raise ValueError(f"cron needs 5 fields: {expr!r}")
        self.expr = expr
        self.minutes, self.hours, self.doms, self.months, self.dows = (
            _parse_field(f, lo, hi, dow=(i == 4))
            for i, (f, (lo, hi)) in enumerate(zip(fields, _CRON_BOUNDS))
        )
        self._dom_any = fields[2] == "*"
        self._dow_any = fields[4] == "*"

    def _day_matches(self, d: date) -> bool:
        dom_ok = d.day in self.doms
        dow_ok = (d.weekday() + 1) % 7 in self.dows  # python Mon=0 → cron Sun=0
        if self._dom_any and self._dow_any:
            return True
        if self._dom_any:
            return dow_ok
        if self._dow_any:
            return dom_ok
        return dom_ok or dow_ok

    def _next_fire(self, ts: datetime) -> datetime:
        # minute resolution; scan days (bounded), then the <=1440
        # precomputed (hour, minute) slots within the day
        t = (ts + timedelta(minutes=1)).replace(second=0, microsecond=0)
        slots = sorted((h, m) for h in self.hours for m in self.minutes)
        for _ in range(366 * 5):  # 5-year horizon guard
            d = t.date()
            if d.month in self.months and self._day_matches(d):
                for h, m in slots:
                    cand = datetime.combine(d, dtime(h, m))
                    if cand >= t:
                        return cand
            t = datetime.combine(d + timedelta(days=1), dtime.min)
        raise ValueError(f"cron {self.expr!r}: no fire within 5 years of {ts}")

    def next_interval_after(self, ts: datetime) -> DataInterval:
        start = self._next_fire(ts)
        return DataInterval(start, self._next_fire(start))


class IntervalTimetable(Timetable):
    """Fixed-period schedule anchored at ``start`` (≈ DAG(schedule=
    timedelta(...), start_date=...)); O(1) next-run arithmetic."""

    def __init__(self, start: datetime, every: timedelta) -> None:
        if every <= timedelta(0):
            raise ValueError("interval must be positive")
        self.start = start
        self.every = every

    def next_interval_after(self, ts: datetime) -> DataInterval:
        if ts < self.start:
            return DataInterval(self.start, self.start + self.every)
        n = int((ts - self.start) / self.every) + 1
        s = self.start + n * self.every
        return DataInterval(s, s + self.every)


def _us_federal_holidays(start: date, end: date) -> set[date]:
    """Optional pandas holiday hookup, import-gated exactly like the
    reference plugin (workday.py:36 falls back to 'no holidays' when
    pandas is absent)."""
    try:
        from pandas.tseries.holiday import USFederalHolidayCalendar
    except ImportError:  # pragma: no cover - pandas is baked in here
        return set()
    cal = USFederalHolidayCalendar()
    return {t.date() for t in cal.holidays(start=str(start), end=str(end))}


class WorkdayTimetable(Timetable):
    """Daily-at-midnight on workdays: skips Sat/Sun and holidays
    (≈ plugins/workday.py AfterWorkdayTimetable). ``holidays`` is an
    explicit date set; ``use_us_federal=True`` unions in the pandas
    USFederalHolidayCalendar when available. Each run's interval is
    one calendar day (the reference's DagRunInfo.interval(start,
    start+1d))."""

    def __init__(
        self,
        holidays: set[date] | None = None,
        use_us_federal: bool = False,
        at: dtime = dtime.min,
    ) -> None:
        self.holidays = set(holidays or ())
        self.use_us_federal = use_us_federal
        self.at = at

    def _is_workday(self, d: date) -> bool:
        if d.weekday() in (5, 6):
            return False
        if d in self.holidays:
            return False
        if self.use_us_federal and d in _us_federal_holidays(d, d):
            return False
        return True

    def next_workday(self, d: date, incr: int = 1) -> date:
        while not self._is_workday(d):
            d += timedelta(days=incr)
        return d

    def next_interval_after(self, ts: datetime) -> DataInterval:
        d = ts.date()
        cand = datetime.combine(d, self.at)
        if cand <= ts:
            d += timedelta(days=1)
        d = self.next_workday(d)
        return DataInterval(
            datetime.combine(d, self.at), datetime.combine(d, self.at) + timedelta(days=1)
        )


_ALIASES = {
    "@hourly": "0 * * * *",
    "@daily": "0 0 * * *",
    "@midnight": "0 0 * * *",
    "@weekly": "0 0 * * 0",
    "@monthly": "0 0 1 * *",
    "@yearly": "0 0 1 1 *",
    "@annually": "0 0 1 1 *",
}


def parse_schedule(spec: "str | timedelta | Timetable") -> Timetable:
    """``schedule=`` coercion (≈ DAG(schedule=...)): a Timetable
    passes through, a timedelta anchors at the epoch, a string is a
    cron expression or @alias."""
    if isinstance(spec, Timetable):
        return spec
    if isinstance(spec, timedelta):
        return IntervalTimetable(datetime(1970, 1, 1), spec)
    return CronTimetable(_ALIASES.get(spec, spec))
