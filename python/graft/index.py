"""DateTimeIndex constructors (parity: reference python/sparkts/datetimeindex.py).

These return JVM ``graft.core.DateTimeIndex`` objects, passed to the
``timeseries`` functions that take an index (align, upsample, to_series).
Instants are epoch NANOSECONDS, matching the Scala core.
"""

from ._java import ctx, long_array, zone_id


def irregular(spark, instants_nanos, zone="UTC"):
    """Sorted epoch-nanos instants -> IrregularDateTimeIndex."""
    _, jvm = ctx(spark)
    return jvm.graft.core.IrregularDateTimeIndex(
        long_array(spark, instants_nanos), zone_id(jvm, zone)
    )


def uniform(spark, start_nanos, periods, frequency):
    """start + i*frequency for i in [0, periods) -> UniformDateTimeIndex.

    ``frequency`` is a JVM Frequency from the helpers below.
    """
    _, jvm = ctx(spark)
    start = jvm.graft.core.TimeUtils.fromNanos(
        int(start_nanos), zone_id(jvm, "UTC")
    )
    return jvm.graft.core.DateTimeIndex.uniform(start, int(periods), frequency)


def nanoseconds(spark, n):
    return ctx(spark)[1].graft.core.Frequency.nanoseconds(int(n))


def seconds(spark, n):
    return ctx(spark)[1].graft.core.Frequency.seconds(int(n))


def minutes(spark, n):
    return ctx(spark)[1].graft.core.Frequency.minutes(int(n))


def hours(spark, n):
    return ctx(spark)[1].graft.core.Frequency.hours(int(n))


def days(spark, n):
    return ctx(spark)[1].graft.core.Frequency.days(int(n))


def months(spark, n):
    return ctx(spark)[1].graft.core.Frequency.months(int(n))


def years(spark, n):
    return ctx(spark)[1].graft.core.Frequency.years(int(n))


def business_days(spark, n, first_day_of_week=1):
    return ctx(spark)[1].graft.core.Frequency.businessDays(
        int(n), int(first_day_of_week)
    )
