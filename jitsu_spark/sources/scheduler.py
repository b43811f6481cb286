"""Sync scheduling: cron + timezone semantics and job reconciliation.

Reference (`webapps/console/lib/server/sync.ts:653-742`): each sync config
carries a 5-field cron `schedule` and a `timezone` (default "Etc/UTC");
a reconcile pass diffs desired syncs against the scheduler's existing
jobs — create the missing, delete the orphaned, update only when the
schedule or timezone changed — and each job fires `/sources/run?syncId=`.

The Spark engine keeps the same model: `reconcile_jobs` is the diff,
`CronSchedule` evaluates the cron in the sync's timezone (stdlib
zoneinfo — local wall-clock semantics, so "0 9 * * *" in
America/New_York follows DST like Cloud Scheduler does), and `due_syncs`
picks which syncs a scheduler tick should launch (`sources.sync` runs
them as incremental MERGE jobs).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from zoneinfo import ZoneInfo

_FIELDS = ("minute", "hour", "dom", "month", "dow")
_RANGES = {
    "minute": (0, 59),
    "hour": (0, 23),
    "dom": (1, 31),
    "month": (1, 12),
    "dow": (0, 6),  # 0 = Sunday (cron convention; 7 folds to 0)
}


def _parse_field(spec: str, lo: int, hi: int, fold7: bool = False) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part in ("*", ""):
            lo_v, hi_v = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            lo_v, hi_v = int(a), int(b)
        else:
            v = int(part)
            if fold7 and v == 7:
                v = 0
            if not lo <= v <= hi:
                raise ValueError(f"cron value {v} out of range [{lo},{hi}]")
            if step == 1:
                out.add(v)
                continue
            lo_v, hi_v = v, hi
        for v in range(lo_v, hi_v + 1, step):
            out.add(0 if fold7 and v == 7 else v)
    if not all(lo <= v <= hi for v in out):
        raise ValueError(f"cron field {spec!r} out of range [{lo},{hi}]")
    return out


@dataclass(frozen=True)
class CronSchedule:
    """A parsed 5-field cron expression evaluated in a named timezone."""

    expression: str
    timezone: str = "Etc/UTC"  # sync.ts:703 default

    def __post_init__(self):
        fields = self.expression.split()
        if len(fields) != 5:
            raise ValueError(
                f"cron needs 5 fields (minute hour dom month dow): "
                f"{self.expression!r}"
            )
        parsed = {}
        for name, spec in zip(_FIELDS, fields):
            lo, hi = _RANGES[name]
            parsed[name] = _parse_field(spec, lo, hi, fold7=(name == "dow"))
        object.__setattr__(self, "_fields", parsed)
        object.__setattr__(self, "_tz", ZoneInfo(self.timezone))
        # Vixie-cron dom/dow rule metadata: a field written with a
        # leading '*' is unrestricted; an explicit full range like '1-31'
        # is RESTRICTED (it participates in the either-or rule) even
        # though its value set equals the star set.
        object.__setattr__(self, "_dom_star", fields[2].startswith("*"))
        object.__setattr__(self, "_dow_star", fields[4].startswith("*"))

    def matches(self, when: dt.datetime) -> bool:
        """True when the instant falls on the schedule, evaluated on the
        wall clock of the schedule's timezone. Standard cron dom/dow rule:
        when both are restricted, either matching fires."""
        local = when.astimezone(self._tz) if when.tzinfo else when.replace(
            tzinfo=dt.timezone.utc
        ).astimezone(self._tz)
        f = self._fields
        dow = (local.weekday() + 1) % 7  # Monday=0 -> cron Sunday=0
        day_ok = (
            (local.day in f["dom"] and dow in f["dow"])
            if (self._dom_star or self._dow_star)
            else (local.day in f["dom"] or dow in f["dow"])
        )
        return (
            local.minute in f["minute"]
            and local.hour in f["hour"]
            and local.month in f["month"]
            and day_ok
        )

    def next_run(self, after: dt.datetime) -> dt.datetime:
        """First matching instant strictly after `after` (UTC result).
        Linear minute scan bounded to 4 years — schedules are config,
        ticks are minutes; this is not a hot path.

        DST: matching is by wall clock, so a time that doesn't exist on
        spring-forward day (e.g. 02:30 America/New_York on the jump day)
        is SKIPPED to the next day, and a time that occurs twice on
        fall-back day fires on its first occurrence only (the scan
        returns the earliest matching instant). Deterministic, never
        double-fires."""
        if after.tzinfo is None:
            after = after.replace(tzinfo=dt.timezone.utc)
        # Fire slots are LOCAL wall-clock instants, and the local clock
        # must advance strictly past the anchor's local time: on
        # fall-back day every slot of the repeated hour exists at two
        # instants, and requiring candidate_local > anchor_local skips
        # the entire replayed hour — no slot double-fires, whatever the
        # schedule density.
        anchor_local = after.astimezone(self._tz).replace(tzinfo=None)
        t = (after + dt.timedelta(minutes=1)).replace(second=0, microsecond=0)
        limit = after + dt.timedelta(days=4 * 366)
        while t <= limit:
            if (
                t.astimezone(self._tz).replace(tzinfo=None) > anchor_local
                and self.matches(t)
            ):
                return t.astimezone(dt.timezone.utc)
            t += dt.timedelta(minutes=1)
        raise ValueError(f"no next run within 4 years for {self.expression!r}")


@dataclass(frozen=True)
class SyncJobSpec:
    """The slice of sync config the scheduler consumes (sync.ts:699-711)."""

    sync_id: str
    schedule: str
    timezone: str = "Etc/UTC"


def reconcile_jobs(
    desired: dict[str, SyncJobSpec], existing: dict[str, SyncJobSpec]
) -> dict[str, list[str]]:
    """Port of the Cloud Scheduler reconcile diff (sync.ts:687-741):
    create syncs with no job, delete jobs with no sync, and update only
    the jobs whose schedule or timezone changed."""
    create = sorted(set(desired) - set(existing))
    delete = sorted(set(existing) - set(desired))
    update = sorted(
        sid
        for sid in set(desired) & set(existing)
        if (desired[sid].schedule, desired[sid].timezone)
        != (existing[sid].schedule, existing[sid].timezone)
    )
    return {"create": create, "delete": delete, "update": update}


def due_syncs(
    specs: list[SyncJobSpec],
    last_runs: dict[str, dt.datetime],
    now: dt.datetime,
) -> list[str]:
    """Which syncs a scheduler tick should launch: those whose next run
    after their last run is <= now (never-run syncs use their next match
    from the epoch of `now - 1 tick`... i.e., they fire on the first
    matching instant <= now)."""
    due = []
    for spec in specs:
        cron = CronSchedule(spec.schedule, spec.timezone)
        anchor = last_runs.get(spec.sync_id)
        if anchor is None:
            # never ran: due if any match occurred in the last day
            anchor = now - dt.timedelta(days=1)
        if cron.next_run(anchor) <= (
            now if now.tzinfo else now.replace(tzinfo=dt.timezone.utc)
        ):
            due.append(spec.sync_id)
    return due
