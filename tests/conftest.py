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
    """Span-sequence equality key. The north rule pins (kind, text,
    media_ref, order); round 3 added the page field to the output struct,
    so it is pinned too (tolerating inputs that predate it)."""
    def _page(s):
        try:
            return s["page"]
        except (KeyError, ValueError, IndexError):
            return None
    return [(s["kind"], s["text"], s["media_ref"], s["offset"], _page(s))
            for s in spans]
