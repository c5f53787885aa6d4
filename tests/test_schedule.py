"""Schedule stepping parity — exact vectors from ``ScheduleTest.java:12-42``."""

from datetime import datetime

from chronicrawl_spark.functions.schedule import (
    BUILTIN_SCHEDULES,
    Schedule,
    batch_apply,
    next_set_bit_wrap,
)


def test_next_set_bit_wrap():
    # ScheduleTest.java:13-18
    assert next_set_bit_wrap(0b1101010, 0) == 1
    assert next_set_bit_wrap(0b1101010, 1) == 1
    assert next_set_bit_wrap(0b1101010, 2) == 3
    assert next_set_bit_wrap(0b1101010, 8) == 1


def test_schedule_vectors():
    # ScheduleTest.java:20-42 (times are zone-naive here = UTC)
    t = datetime(2020, 8, 6, 12, 34, 21)

    thursdays = Schedule(0, "", 0, 0, 0, 1 << 3, 0)
    assert thursdays.apply(t) == datetime(2020, 8, 13, 12, 34, 21)

    at9and15 = Schedule(0, "", 0, 0, 0, 0, (1 << 9) | (1 << 15))
    assert at9and15.apply(t) == datetime(2020, 8, 6, 15, 34, 21)
    assert at9and15.apply(at9and15.apply(t)) == datetime(2020, 8, 7, 9, 34, 21)

    wed = Schedule(0, "", 0, 0, 0, 1 << 2, (1 << 9) | (1 << 15))
    assert wed.apply(t) == datetime(2020, 8, 12, 15, 34, 21)

    wedfri = Schedule(0, "", 0, 0, 0, (1 << 4) | (1 << 2), (1 << 9) | (1 << 15))
    v = wedfri.apply(t)
    assert v == datetime(2020, 8, 7, 15, 34, 21)
    v = wedfri.apply(v)
    assert v == datetime(2020, 8, 12, 9, 34, 21)
    v = wedfri.apply(v)
    assert v == datetime(2020, 8, 12, 15, 34, 21)
    v = wedfri.apply(v)
    assert v == datetime(2020, 8, 14, 9, 34, 21)


def test_month_clamping():
    # java.time plusMonths semantics: Jan 31 + 1 month = Feb 29 (leap) / 28
    monthly = Schedule(0, "", 0, 1, 0, 0, 0)
    assert monthly.apply(datetime(2020, 1, 31)) == datetime(2020, 2, 29)
    assert monthly.apply(datetime(2021, 1, 31)) == datetime(2021, 2, 28)


def test_builtins_shape():
    # schema.sql:171-184 verbatim: 13 rows, ids 0..12
    assert [s.id for s in BUILTIN_SCHEDULES] == list(range(13))
    twice_daily = BUILTIN_SCHEDULES[10]
    assert twice_daily.hours_of_day == 1048832  # bits 8 and 20
    assert twice_daily.hours_of_day == (1 << 8) | (1 << 20)


def test_batch_apply():
    sched = {s.id: s for s in BUILTIN_SCHEDULES}
    t0 = int((datetime(2020, 8, 6, 12, 34, 21) - datetime(1970, 1, 1)).total_seconds() * 1000)
    [out] = batch_apply(sched, [0], [t0])
    assert out == t0 + 86400_000
