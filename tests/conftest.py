import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from timely_spark.session import get_spark

    s = get_spark("timely-tests", master="local[4]")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ramp_points(spark):
    """The reference's canonical fixture: one ramp series value=i at
    second i (RateIteratorTest.java:34-45), one flat series, 2 tags."""
    from timely_spark.sources.lineprotocol import parse_lines_df

    base = 1_447_767_913_000  # arbitrary fixed epoch ms
    lines = [
        f"put sys.eth0.rx {base + 1000 * i} {float(i)} host=h1 rack=r1"
        for i in range(1, 121)
    ] + [
        f"put sys.cpu.user {base + 1000 * i} 1.0 tag1=value1 tag2=value2"
        for i in range(1, 121)
    ]
    df = parse_lines_df(spark.createDataFrame([(l,) for l in lines], ["value"]))
    df.cache().count()
    return base, df
