"""Calendar revisit schedules — bitmask stepping (ref ``Schedule.java:20-145``).

``apply(prev)`` adds the year/month/day period, then advances to the next
eligible hour-of-day bit (wrapping to the next day), then to the next
eligible day-of-week bit (Mon=bit0).  Month/year addition clamps the
day-of-month exactly like ``java.time`` ``plusMonths``/``plusYears``.

Property-tested against the reference's ``ScheduleTest.java:12-42`` vectors.
The engine evaluates schedules in UTC (the reference uses the system zone —
``Schedule.java:142-144``; we pin UTC for determinism and document it).
"""

from __future__ import annotations

import calendar
from dataclasses import dataclass
from datetime import datetime, timedelta


def next_set_bit(bits: int, start: int) -> int:
    """Index of lowest set bit ≥ start, else 32 (``Schedule.java:66-68``)."""
    masked = bits & (((1 << 32) - 1) << start) if start < 32 else 0
    if masked == 0:
        return 32
    return (masked & -masked).bit_length() - 1


def next_set_bit_wrap(bits: int, start: int) -> int:
    i = next_set_bit(bits, start)
    return next_set_bit(bits, 0) if i >= 32 else i


def _plus_months(dt: datetime, months: int) -> datetime:
    y = dt.year + (dt.month - 1 + months) // 12
    m = (dt.month - 1 + months) % 12 + 1
    d = min(dt.day, calendar.monthrange(y, m)[1])
    return dt.replace(year=y, month=m, day=d)


@dataclass(frozen=True)
class Schedule:
    id: int
    name: str
    years: int
    months: int
    days: int
    days_of_week: int  # bitmask, Monday = bit 0
    hours_of_day: int  # bitmask, hour 0-23

    def apply(self, prev: datetime) -> datetime:
        nxt = _plus_months(prev, self.years * 12 + self.months) + timedelta(days=self.days)

        if self.hours_of_day != 0:
            hour = next_set_bit_wrap(self.hours_of_day, nxt.hour + 1)
            if hour <= nxt.hour:
                nxt += timedelta(days=1)
            nxt = nxt.replace(hour=hour)

        if self.days_of_week != 0:
            if self.hours_of_day == 0:
                nxt += timedelta(days=1)
            # isoweekday(): Mon=1 → bit index 0 (Schedule.java:54)
            day = next_set_bit_wrap(self.days_of_week, nxt.isoweekday() - 1)
            # TemporalAdjusters.nextOrSame(DayOfWeek.of(day + 1))
            delta = (day + 1 - nxt.isoweekday()) % 7
            nxt += timedelta(days=delta)

        return nxt


# The 13 built-in schedule rows, verbatim (ref schema.sql:171-184).
BUILTIN_SCHEDULES = [
    Schedule(0, "Daily", 0, 0, 1, 0, 0),
    Schedule(1, "Weekly", 0, 0, 7, 0, 0),
    Schedule(2, "Fortnightly", 0, 0, 14, 0, 0),
    Schedule(3, "2-Monthly", 0, 2, 0, 0, 0),
    Schedule(4, "Quarterly", 0, 3, 0, 0, 0),
    Schedule(5, "Half-Annual", 0, 6, 0, 0, 0),
    Schedule(6, "9-Monthly", 0, 9, 0, 0, 0),
    Schedule(7, "Annual", 1, 0, 0, 0, 0),
    Schedule(8, "18-Monthly", 0, 18, 0, 0, 0),
    Schedule(9, "Biennial", 2, 0, 0, 0, 0),
    Schedule(10, "Twice-Daily", 0, 0, 0, 0, 1048832),  # hours 8 & 20
    Schedule(11, "Weekdays", 0, 0, 0, 31, 0),
    Schedule(12, "Weekends", 0, 0, 0, 96, 0),
]


def batch_apply(schedules: dict[int, Schedule], schedule_ids, prev_millis):
    """Vectorized-per-batch next-fire computation for pandas UDFs:
    (schedule_id, prev_epoch_millis) → next_epoch_millis (UTC)."""
    out = []
    for sid, pm in zip(schedule_ids, prev_millis):
        if sid is None or pm is None or sid not in schedules:
            out.append(None)
            continue
        prev = datetime(1970, 1, 1) + timedelta(milliseconds=int(pm))
        nxt = schedules[int(sid)].apply(prev)
        out.append(round((nxt - datetime(1970, 1, 1)).total_seconds() * 1000))
    return out


COMPARISON_TIME = datetime(2018, 1, 1, 9, 0, 0)  # Schedule.java:21 (UTC)


def natural_sort(schedules: list[Schedule]) -> list[Schedule]:
    """W7 — schedules ordered by their next fire from a fixed comparison
    instant (``Schedule.java:70-73``, ``Database.java:312-316``)."""
    return sorted(schedules, key=lambda s: s.apply(COMPARISON_TIME))
