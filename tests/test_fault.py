"""Worker-death fault injection — the SURVEY §4.2 claim ("Ray task
retries + lineage re-execution" heal mid-run worker loss) driven for
real: a poison stage kills its own WORKER PROCESS (stateless-task case)
or its ACTOR (actor-pool case) exactly once mid-run via an O_EXCL flag
file, and the run must (a) complete, (b) produce outputs identical to
an uninterrupted twin, (c) leave sidecars / index manifests
uncorrupted. Ray Data actor pools carry max_restarts=-1 /
max_task_retries=-1 by default, so a killed actor is respawned and its
in-flight batch re-executed from lineage.

All poison helpers are defined INSIDE the tests: respawned workers
deserialize closures by value — a module-level helper in a test file
would need `import test_fault` on a worker whose sys.path lacks the
tests dir (the original worker inherited it, its replacement does not).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
import ray.data

from ctinexus_ray.sources.synth import write_cc_corpus
from ctinexus_ray.state.checkpoint import run_resumable

def _make_poison():
    """A kill-once function (dies the first time ANY worker passes;
    every retry sees the flag and survives). Returned as a closure so
    cloudpickle ships it by VALUE."""

    def poison_once(flag):
        import os as _os

        try:
            fd = _os.open(flag, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
            _os.close(fd)
            _os._exit(1)
        except FileExistsError:
            pass

    return poison_once


def _make_mark():
    def mark_batch(batch):
        import pyarrow.compute as pc

        return batch.append_column(
            "text_len", pc.utf8_length(batch.column("text"))
        )

    return mark_batch


@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    out = tmp_path_factory.mktemp("cc_fault")
    return [str(p) for p in write_cc_corpus(out, 40, rows_per_file=20)]


def _parts(out_dir):
    return sorted(
        p for p in os.listdir(out_dir) if p.startswith("part-")
    )


def _assert_same_outputs(poisoned_dir, clean_dir):
    """Same shard set, same per-shard row CONTENT. Row order may differ:
    a retried block completes later and Ray Data's streaming executor
    does not preserve inter-block order by default — lineage guarantees
    the multiset of rows, so compare sorted on the unique url key."""
    assert _parts(poisoned_dir) == _parts(clean_dir)
    for name in _parts(poisoned_dir):
        got = pq.read_table(os.path.join(poisoned_dir, name))
        want = pq.read_table(os.path.join(clean_dir, name))
        got = got.sort_by("url")
        want = want.sort_by("url")
        assert got.equals(want), f"shard {name} diverged after fault"


class TestWorkerDeath:
    def test_task_worker_death_heals(
        self, corpus_files, tmp_path, ray_session
    ):
        """A stateless map_batches task's worker dies mid-run: Ray
        retries the task, run_resumable commits every shard, outputs
        byte-identical to an undisturbed run."""
        flag = str(tmp_path / "task_poison")
        poison_once, mark_batch = _make_poison(), _make_mark()

        def poisoned(ds):
            def stage(batch):
                poison_once(flag)
                return mark_batch(batch)

            return ds.map_batches(stage, batch_format="pyarrow")

        def clean(ds):
            return ds.map_batches(mark_batch, batch_format="pyarrow")

        got = run_resumable(corpus_files, tmp_path / "poisoned", poisoned)
        assert os.path.exists(flag), "poison never fired"
        assert got["processed"] == 2 and got["rows"] == 40
        run_resumable(corpus_files, tmp_path / "clean", clean)
        _assert_same_outputs(tmp_path / "poisoned", tmp_path / "clean")
        # lineage sidecars intact and parseable
        import json

        for s in sorted((tmp_path / "poisoned").glob("_SUCCESS.*.json")):
            assert json.loads(s.read_text())["rows"] == 20

    def test_actor_death_heals(self, corpus_files, tmp_path, ray_session):
        """An actor-pool worker (the LLM-stage shape) dies mid-run: the
        pool respawns it, the in-flight batch re-executes, outputs
        match the undisturbed twin."""
        flag = str(tmp_path / "actor_poison")
        poison_once, mark_batch = _make_poison(), _make_mark()

        class SuicidalActorStage:
            def __init__(self, flag_path):
                self.flag = flag_path

            def __call__(self, batch):
                poison_once(self.flag)
                return mark_batch(batch)

        def poisoned(ds):
            return ds.map_batches(
                SuicidalActorStage,
                fn_constructor_kwargs={"flag_path": flag},
                batch_format="pyarrow",
                batch_size=8,
                concurrency=(1, 2),
            )

        def clean(ds):
            return ds.map_batches(mark_batch, batch_format="pyarrow")

        got = run_resumable(corpus_files, tmp_path / "poisoned", poisoned)
        assert os.path.exists(flag), "poison never fired"
        assert got["processed"] == 2 and got["rows"] == 40
        run_resumable(corpus_files, tmp_path / "clean", clean)
        _assert_same_outputs(tmp_path / "poisoned", tmp_path / "clean")

    def test_kg_actor_death_end_to_end(
        self, corpus_files, tmp_path, ray_session, config
    ):
        """The real KG pipeline with a poison stage BETWEEN extract and
        the fused LLM actor pool — worker death upstream of the actor
        pool must not corrupt the docs_kg checkpoint (shard outputs
        equal the undisturbed run's)."""
        from ctinexus_ray.pipelines.kg import (
            KG_DOC_COLUMNS,
            extract_documents,
            run_kg_stage,
        )

        flag = str(tmp_path / "kg_poison")
        poison_once = _make_poison()

        def make_pipeline(poison: bool):
            def pipeline(ds):
                ds = extract_documents(ds, config)
                if poison:
                    def stage(batch):
                        poison_once(flag)
                        return batch

                    ds = ds.map_batches(stage, batch_format="pyarrow")
                return run_kg_stage(ds, config).select_columns(
                    KG_DOC_COLUMNS
                )

            return pipeline

        got = run_resumable(
            corpus_files, tmp_path / "poisoned", make_pipeline(True)
        )
        assert os.path.exists(flag), "poison never fired"
        assert got["processed"] == 2
        run_resumable(
            corpus_files, tmp_path / "clean", make_pipeline(False)
        )
        _assert_same_outputs(tmp_path / "poisoned", tmp_path / "clean")

    def test_index_build_task_death_keeps_manifest_atomic(
        self, tmp_path, ray_session
    ):
        """Worker death during the text-index build: the build's
        manifest commits once, stats are exact, and pruned search equals
        the full-scan twin over the corpus."""
        from ctinexus_ray.ops.textindex import (
            text_index_build,
            text_index_search,
        )
        from ctinexus_ray.ops.textstats import bm25_topk_docs
        from ctinexus_ray.state.tableformat import latest_version

        flag = str(tmp_path / "idx_poison")
        poison_once = _make_poison()
        texts = [f"hash join doc {i} vector index" for i in range(50)]
        docs = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        )

        def stage(batch):
            poison_once(flag)
            return batch

        idx = str(tmp_path / "tindex")
        text_index_build(
            docs.map_batches(stage, batch_format="pyarrow"), idx,
            num_buckets=8,
        )
        assert os.path.exists(flag), "poison never fired"
        assert latest_version(idx) == 1  # exactly one commit
        got = text_index_search(idx, ["hash", "vector"], k=10).to_pydict()
        want = bm25_topk_docs(docs, ["hash", "vector"], k=10).to_pydict()
        assert got == want
