"""The composed webtext flagship (jobs/webtext_job.py): crawl ->
versioned-corpus commit -> index fold -> prepare, end-to-end on a tiny
corpus; a second run must skip every phase; the index must answer from
the committed corpus; a new crawl tick must append instead of rebuild."""

import pyarrow.parquet as pq
import pytest
import ray.data

from ctinexus_ray.sources.synth import write_cc_corpus


@pytest.fixture()
def corpus(tmp_path):
    write_cc_corpus(tmp_path / "cc", 40, rows_per_file=20)
    return str(tmp_path / "cc")


class TestWebtextJob:
    def test_end_to_end_and_rerun_skips(self, corpus, tmp_path, ray_session):
        from jobs.webtext_job import run_webtext_job

        out = str(tmp_path / "out")
        r1 = run_webtext_job(corpus, out, num_partitions=4)
        assert r1["crawl"].get("skipped") is not True
        assert r1["commit"]["skipped"] is False
        assert r1["index"]["text_index_folded"] == 1
        assert r1["prepare"]["dedup"]["skipped"] is False
        assert r1["prepare"]["shards"]["processed"] >= 1

        # the committed corpus is the canonical documents shape
        from ctinexus_ray.state.tableformat import read_version

        schema = read_version(out + "/corpus").schema()
        assert set(schema.names) == {
            "doc_id", "url", "warc_ts", "lang", "text"
        }
        n_corpus = read_version(out + "/corpus").count()
        assert n_corpus == r1["crawl"]["refined_pages"]

        # index answers over exactly the committed corpus
        from ctinexus_ray.ops.textindex import text_index_search
        from ctinexus_ray.ops.textstats import bm25_topk_docs

        got = text_index_search(out + "/corpus_index", ["the"], k=5)
        want = bm25_topk_docs(
            read_version(out + "/corpus", columns=["doc_id", "text"]),
            ["the"], k=5,
        )
        assert got.to_pydict() == want.to_pydict()

        r2 = run_webtext_job(corpus, out, num_partitions=4)
        assert r2["crawl"]["skipped"] is True
        assert r2["commit"]["skipped"] is True
        assert r2["index"]["text_index_folded"] == 0
        assert r2["prepare"]["dedup"]["skipped"] is True
        assert r2["prepare"]["shards"]["processed"] == 0
        assert r2["prepare"]["shards"]["skipped"] >= 1

    def test_new_tick_commits_snapshot_and_rebuilds_index(
        self, corpus, tmp_path, ray_session
    ):
        """A second crawl tick (new shards in the SAME input dir): the
        refined state is a wholesale rewrite (keep-latest is global),
        so the corpus commits as an OVERWRITE snapshot — never doubling
        old docs — the index rebuilds from the new version, and prepare
        reruns keyed by the new corpus version."""
        from jobs.webtext_job import run_webtext_job

        from ctinexus_ray.state.tableformat import (
            latest_version,
            read_version,
            version_mode,
        )

        out = str(tmp_path / "out")
        r1 = run_webtext_job(corpus, out, num_partitions=4)
        v1_docs = read_version(out + "/corpus").count()

        import os

        from ctinexus_ray.sources.synth import make_cc_table

        # 20 genuinely NEW urls (start_id past tick 1's) — same-url
        # re-crawls would be keep-latest-collapsed, which is correct
        # but not what this test measures
        pq.write_table(
            make_cc_table(20, start_id=1000),
            os.path.join(corpus, "tick2-part-00000.parquet"),
        )
        os.remove(out + "/crawl/_CRAWL_SUCCESS.json")  # new input state
        r2 = run_webtext_job(corpus, out, num_partitions=4)
        assert r2["commit"]["skipped"] is False
        assert latest_version(out + "/corpus") == 2
        assert version_mode(out + "/corpus", 2) == "overwrite"
        # snapshot: exactly the refined corpus, old docs NOT doubled
        n2 = read_version(out + "/corpus").count()
        assert n2 == r2["crawl"]["refined_pages"] == v1_docs + 20
        assert r2["index"]["text_index_folded"] == 1
        assert "rebuilt" in r2["index"]
        assert r2["prepare"]["dedup"]["skipped"] is False

        # rebuilt index answers over the new snapshot exactly
        from ctinexus_ray.ops.textindex import text_index_search
        from ctinexus_ray.ops.textstats import bm25_topk_docs

        got = text_index_search(out + "/corpus_index", ["the"], k=5)
        want = bm25_topk_docs(
            read_version(out + "/corpus", columns=["doc_id", "text"]),
            ["the"], k=5,
        )
        assert got.to_pydict() == want.to_pydict()
