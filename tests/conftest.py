import pytest

from mivaa_pdf_extractor_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="tests", master="local[4]",
                      shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def spans_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
