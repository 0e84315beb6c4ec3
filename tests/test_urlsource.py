"""URL-source stage tests: record shape, error paths, summarize+repair."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from ctinexus_ray.schemas import DOCUMENTS_SCHEMA
from ctinexus_ray.sources.synth import make_cc_table
from ctinexus_ray.stages.urlsource import UrlSourceStage, url_source_dataset


@pytest.fixture(scope="module")
def stage(config):
    return UrlSourceStage(config=config)


def _row(url, html):
    import datetime

    return {
        "url": url,
        "warc_ts": datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc),
        "html": html,
        "text": "",
        "lang": "en",
    }


class TestErrorPaths:
    def test_invalid_url(self, stage):
        batch = pa.Table.from_pylist(
            [_row("not a url with spaces", b"<html><body>x</body></html>")],
            schema=DOCUMENTS_SCHEMA,
        )
        out = stage(batch).to_pylist()[0]
        assert out["status"] == "error"
        assert out["error_code"] == "invalid_url"

    def test_missing_html(self, stage):
        batch = pa.Table.from_pylist(
            [_row("https://x.example.com/a", None)], schema=DOCUMENTS_SCHEMA
        )
        out = stage(batch).to_pylist()[0]
        assert out["error_code"] == "fetch_failed"

    def test_scheme_prepended(self, stage):
        batch = pa.Table.from_pylist(
            [_row("x.example.com/a", None)], schema=DOCUMENTS_SCHEMA
        )
        out = stage(batch).to_pylist()[0]
        assert out["url"] == "https://x.example.com/a"


class TestSuccessPath:
    def test_records_over_synthetic_corpus(self, ray_session, config):
        docs = ray.data.from_arrow(make_cc_table(30))
        rows = url_source_dataset(docs, config).take_all()
        assert len(rows) == 30
        ok = [r for r in rows if r["status"] == "success"]
        assert len(ok) == 30
        for r in ok:
            assert r["source_domain"] == "threat-reports.example.com"
            assert r["raw_text_length"] > 0
            assert r["final_text"]
            assert r["summary_input_tokens"] > 0
            # summary is a normalized single paragraph
            assert "\n" not in r["summarized_text"]

    def test_repair_path_produces_well_formed(self, stage):
        """The mock deliberately drifts some summaries ill-formed; after the
        repair pass none should start with a preamble."""
        from ctinexus_ray.functions.text import is_well_formed_cti_paragraph

        batch = make_cc_table(40)
        out = stage(batch).to_pylist()
        assert all(
            not r["summarized_text"].lower().startswith("here is")
            for r in out
        )
        well = [r for r in out if is_well_formed_cti_paragraph(r["summarized_text"])]
        assert len(well) >= 35  # repair fixed the drifted ones

    def test_deterministic(self, stage, config):
        from ctinexus_ray.stages.urlsource import UrlSourceStage

        batch = make_cc_table(10)
        a = stage(batch).to_pylist()
        b = UrlSourceStage(config=config)(batch).to_pylist()
        assert a == b
