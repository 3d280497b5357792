import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from timely_spark.session import get_spark

    s = get_spark(
        "timely-tests",
        master="local[4]",
        warehouse_dir=str(tmp_path_factory.mktemp("spark-warehouse")),
    )
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


# ----------------------------------------------------------------- TLS certs

ALICE_SUBJ = "/C=US/O=Example Corp/OU=Example Developers/CN=Alice User"
BOB_SUBJ = "/C=US/O=Example Corp/OU=Example Developers/CN=Bob User"


def _openssl(*args):
    import subprocess

    subprocess.run(["openssl", *args], check=True, capture_output=True)


@pytest.fixture(scope="session")
def certs(tmp_path_factory):
    """Session CA + server/alice/bob certs via the openssl CLI (the
    reference's use-generated-keypair test mode)."""
    d = tmp_path_factory.mktemp("certs")
    ca_key, ca_pem = str(d / "ca.key"), str(d / "ca.pem")
    _openssl(
        "req", "-x509", "-newkey", "rsa:2048", "-nodes", "-keyout", ca_key,
        "-out", ca_pem, "-days", "2",
        "-subj", "/C=US/O=Example Corp/CN=Example Corp CA",
    )
    out = {"ca": ca_pem}
    for name, subj in [
        ("server", "/CN=localhost"),
        ("alice", ALICE_SUBJ),
        ("bob", BOB_SUBJ),
    ]:
        key, csr, pem = (str(d / f"{name}.{ext}") for ext in ("key", "csr", "pem"))
        _openssl("req", "-newkey", "rsa:2048", "-nodes", "-keyout", key,
                 "-out", csr, "-subj", subj)
        ext = str(d / f"{name}.ext")
        with open(ext, "w") as f:
            f.write("subjectAltName=IP:127.0.0.1,DNS:localhost\n")
        _openssl("x509", "-req", "-in", csr, "-CA", ca_pem, "-CAkey", ca_key,
                 "-CAcreateserial", "-out", pem, "-days", "2", "-extfile", ext)
        out[name] = pem
        out[f"{name}.key"] = key
    return out
