import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


def _combined_corpus():
    from ctinexus_ray.ops.multimodal import (
        make_audio_dup_corpus,
        make_phash_corpus,
        make_video_dup_corpus,
    )

    img = make_phash_corpus(4)
    aud = make_audio_dup_corpus(4)
    vid = make_video_dup_corpus(4)

    def offset(t: pa.Table, off: int) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(
            t.column_names.index("media_id"),
            "media_id",
            pc.add(t.column("media_id"), off),
        )

    return pa.concat_tables([img, offset(aud, 1000), offset(vid, 2000)])


class TestMediaDedupJob:
    def test_all_kinds_and_resume(self, ray_session, tmp_path):
        from jobs.media_dedup_job import run_media_dedup

        inp = tmp_path / "in"
        inp.mkdir()
        pq.write_table(_combined_corpus(), inp / "media.parquet")
        out = str(tmp_path / "out")
        stats = run_media_dedup(str(inp), out)
        assert stats["input_rows"] == 36
        assert stats["by_kind"] == {"image": 12, "audio": 12, "video": 12}
        # every planted twin collapses: at least one drop per base
        assert stats["dropped"] >= 12
        kept_ids = {
            r["media_id"]
            for r in ray.data.read_parquet(out).select_columns(["media_id"]).take_all()
        }
        for off in (0, 1000, 2000):
            for i in range(4):
                assert off + 3 * i in kept_ids  # cluster minimum survives
                assert off + 3 * i + 1 not in kept_ids  # twin dropped

        stats2 = run_media_dedup(str(inp), out)
        assert stats2["skipped"] is True

    def test_duplicate_ids_refused(self, ray_session, tmp_path):
        from ctinexus_ray.ops.multimodal import make_phash_corpus
        from jobs.media_dedup_job import run_media_dedup

        inp = tmp_path / "in"
        inp.mkdir()
        t = make_phash_corpus(2)
        pq.write_table(pa.concat_tables([t, t]), inp / "media.parquet")
        with pytest.raises(ValueError, match="not unique"):
            run_media_dedup(str(inp), str(tmp_path / "out"))
