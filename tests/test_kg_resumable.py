"""Resumable corpus-run tests: shard commits, skip-on-restart, lineage
metrics, identical final outputs."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
import ray.data

from ctinexus_ray.pipelines.kg import run_kg_resumable
from ctinexus_ray.sources.synth import write_cc_corpus


@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    out = tmp_path_factory.mktemp("cc")
    return [str(p) for p in write_cc_corpus(out, 60, rows_per_file=20)]


def test_resume_skips_committed_shards(corpus_files, tmp_path, ray_session, config):
    out = tmp_path / "kg"
    first = run_kg_resumable(corpus_files, str(out), config)
    assert first["processed"] == 3 and first["skipped"] == 0

    second = run_kg_resumable(corpus_files, str(out), config)
    assert second["processed"] == 0 and second["skipped"] == 3

    # lineage sidecars carry per-shard metrics
    sidecars = sorted(Path(first["docs_kg"]).glob("_SUCCESS.*.json"))
    assert len(sidecars) == 3
    for path in sidecars:
        rec = json.loads(path.read_text())
        assert rec["docs"] == 20
        assert rec["triples"] > 0
        assert rec["llm_input_tokens"] > 0
        assert "wall_time_s" in rec

    # final outputs cover the whole corpus
    triples = ray.data.read_parquet(first["triples"])
    assert triples.count() > 0
    urls = {r["doc_url"] for r in triples.take_all()}
    assert len(urls) == 60

    nodes = ray.data.read_parquet(first["nodes"])
    keys = [r["entity_key"] for r in nodes.take_all()]
    assert len(keys) == len(set(keys)) > 0


def test_partial_restart_completes(corpus_files, tmp_path, ray_session, config):
    out = tmp_path / "kg2"
    # simulate a crashed run: process only the first shard
    run_kg_resumable(corpus_files[:1], str(out), config)
    result = run_kg_resumable(corpus_files, str(out), config)
    assert result["skipped"] == 1 and result["processed"] == 2
    triples = ray.data.read_parquet(result["triples"])
    assert len({r["doc_url"] for r in triples.take_all()}) == 60
