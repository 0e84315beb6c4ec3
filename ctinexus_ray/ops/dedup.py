"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup.

Each operator is a composition of ``map_batches`` (vectorized partials) and
one ``groupby`` shuffle — the minimum-shuffle shapes for corpus-scale dedup:

  exact          hash-partition on text -> first-per-group
  minhash-lsh    shingle -> 64-perm minhash (numpy) -> band buckets ->
                 groupby(band, bucket) -> candidate pairs -> verify
  simhash        per-doc 64-bit signature (no shuffle)
  ngram-jaccard  shingle inverted index -> groupby(shingle) -> pair counts ->
                 groupby(pair) -> |A∩B| / (|A|+|B|-|A∩B|)
  embedding      blockwise cosine vs a broadcast matrix (brute force), or
                 hyperplane-LSH buckets for the scale path
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min, Sum

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _hash64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def word_shingles(text: str, n: int = 3) -> set[str]:
    """Distinct word n-gram shingles of trimmed whitespace-split text.
    Matches the SQL formulation (1-indexed slices over
    regexp_split_to_array) used by the oracle."""
    words = text.strip().split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Group identical texts; keep the smallest doc_id as the survivor.
    One hash shuffle on the text key. Returns (doc_id, n_dups)."""
    grouped = docs.select_columns(["doc_id", "text"]).groupby("text").aggregate(
        Min("doc_id"), Count()
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("min(doc_id)"),
                "n_dups": batch.column("count()"),
            }
        )

    return grouped.map_batches(rename, batch_format="pyarrow")


def exact_dedup_keep(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Survivor doc_ids only (dedup filter output)."""
    groups = exact_dedup_groups(docs)
    return groups.select_columns(["doc_id"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) permutation parameters derived from blake2b —
    no RNG state, reproducible everywhere."""
    a = np.array(
        [(_hash64(f"mh-a-{seed}-{i}".encode()) % (_MERSENNE - 1)) + 1 for i in range(num_perm)],
        dtype=np.uint64,
    )
    b = np.array(
        [_hash64(f"mh-b-{seed}-{i}".encode()) % _MERSENNE for i in range(num_perm)],
        dtype=np.uint64,
    )
    return a, b


class MinHashStage:
    """Actor-pool stage: per-document MinHash signature + LSH band keys.

    Signature params are built once per actor (``__init__``), the per-batch
    work is vectorized numpy over the shingle-hash array.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n
        self.a, self.b = _minhash_params(num_perm)

    def signature(self, text: str) -> np.ndarray:
        shingles = word_shingles(text, self.shingle_n)
        if not shingles:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        hashes = np.array(
            [_hash64(s.encode("utf-8")) % _MERSENNE for s in shingles], dtype=np.uint64
        )
        # (num_perm, n_shingles) universal hashing mod a Mersenne prime
        products = (self.a[:, None] * hashes[None, :] + self.b[:, None]) % _MERSENNE
        return products.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_band, out_bucket = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            sig = self.signature(text or "")
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                bucket = _hash64(chunk.tobytes() + band.to_bytes(2, "big"))
                out_doc.append(doc_id)
                out_band.append(band)
                out_bucket.append(np.int64(np.uint64(bucket) >> np.uint64(1)))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "bucket": pa.array(out_bucket, type=pa.int64()),
            }
        )


def minhash_candidate_pairs(
    docs: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int = 200,
) -> ray.data.Dataset:
    """LSH candidate pairs: docs sharing any band bucket.

    ``max_bucket`` caps the pairs emitted per bucket (hot-bucket guard —
    a degenerate bucket of B docs would emit B² pairs; capped buckets are
    truncated deterministically by sorted doc_id). Returns distinct
    (a, b) with a < b.
    """
    sigs = docs.select_columns(["doc_id", "text"]).map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "num_perm": num_perm, "bands": bands, "shingle_n": shingle_n,
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).materialize()

    # Buckets of size 1 (the overwhelming majority) can never yield a
    # pair; pre-filtering with a vectorized Count before the per-group
    # pair generation keeps the Python map_groups path off the cold data.
    # Scale path: replace the driver-side hot-set with a broadcast Bloom
    # filter when the number of colliding buckets itself is huge.
    counts = sigs.groupby(["band", "bucket"]).aggregate(Count())

    def only_multi(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch.column("count()"), 2))

    hot = {
        (r["band"], r["bucket"])
        for r in counts.map_batches(only_multi, batch_format="pyarrow").iter_rows()
    }
    if not hot:
        return ray.data.from_items([]).map_batches(
            lambda b: pa.Table.from_pydict(
                {"a": pa.array([], type=pa.int64()),
                 "b": pa.array([], type=pa.int64())}
            ),
            batch_format="pyarrow",
        )
    hot_ref = ray.put(hot)

    def keep_hot(batch: pa.Table) -> pa.Table:
        hot_set = ray.get(hot_ref)
        mask = [
            (band, bucket) in hot_set
            for band, bucket in zip(
                batch.column("band").to_pylist(), batch.column("bucket").to_pylist()
            )
        ]
        return batch.filter(pa.array(mask))

    survivors = sigs.map_batches(keep_hot, batch_format="pyarrow")

    def bucket_to_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"].tolist()))[:max_bucket]
        pairs = [(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]]
        if not pairs:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})

    pairs = survivors.groupby(["band", "bucket"]).map_groups(
        bucket_to_pairs, batch_format="pandas"
    )
    # distinct across bands: one more small shuffle
    return pairs.groupby(["a", "b"]).aggregate(Count()).select_columns(["a", "b"])


def minhash_dedup_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> ray.data.Dataset:
    """LSH candidates verified by exact Jaccard over word shingles.

    Verification broadcasts nothing: candidate pairs are joined back to the
    two texts via a driver-built id->text map ONLY when the corpus is
    small; the scale path verifies inside a groupby over pair keys carrying
    both shingle sets. Here we verify via exact n-gram Jaccard recomputed
    from the broadcast text lookup (documented small-side broadcast).
    """
    candidates = minhash_candidate_pairs(docs, num_perm, bands, shingle_n)
    # small-side broadcast: id -> text (OK for the verify set; at 10^12-doc
    # scale replace with ngram_jaccard_pairs over the candidate set)
    id_text = {
        r["doc_id"]: r["text"]
        for r in docs.select_columns(["doc_id", "text"]).iter_rows()
    }
    lookup_ref = ray.put(id_text)
    n = shingle_n

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        a_col = batch.column("a").to_pylist()
        b_col = batch.column("b").to_pylist()
        out_a, out_b = [], []
        for a, b in zip(a_col, b_col):
            sa = word_shingles(lookup.get(a, ""), n)
            sb = word_shingles(lookup.get(b, ""), n)
            union = len(sa | sb)
            if union and len(sa & sb) / union >= threshold:
                out_a.append(a)
                out_b.append(b)
        return pa.Table.from_pydict(
            {
                "a": pa.array(out_a, type=pa.int64()),
                "b": pa.array(out_b, type=pa.int64()),
            }
        )

    return candidates.map_batches(verify, batch_format="pyarrow")


def resolve_dup_groups(pairs: ray.data.Dataset) -> dict[int, int]:
    """Union-find over verified duplicate pairs -> {doc_id: survivor_id}
    (survivor = smallest id in the connected component). Non-duplicate
    docs are absent from the map.

    The pair set is tiny relative to the corpus (only near-dups), so the
    union-find runs on the driver; at extreme dup rates switch to
    distributed iterative label propagation (repeat min-neighbor groupby
    until fixpoint).
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for row in pairs.iter_rows():
        a, b = find(row["a"]), find(row["b"])
        if a != b:
            if a > b:
                a, b = b, a
            parent[b] = a
    return {doc: find(doc) for doc in list(parent)}


def minhash_dedup_keep(
    docs: ray.data.Dataset, threshold: float = 0.8, **kwargs
) -> ray.data.Dataset:
    """Dedup filter: drop every document whose component survivor is a
    smaller doc_id (MinHash-LSH candidates -> exact-Jaccard verify ->
    union-find). Returns the surviving (doc_id) rows."""
    pairs = minhash_dedup_pairs(docs, threshold=threshold, **kwargs)
    survivors_map = resolve_dup_groups(pairs)
    drop = {doc for doc, surv in survivors_map.items() if doc != surv}
    drop_ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        dropped = ray.get(drop_ref)
        mask = [d not in dropped for d in batch.column("doc_id").to_pylist()]
        return batch.filter(pa.array(mask))

    return docs.select_columns(["doc_id"]).map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over word features (token frequency weighted)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    sigs = []
    for text in texts:
        counts = Counter((text or "").strip().split())
        acc = np.zeros(64, dtype=np.int64)
        for word, weight in counts.items():
            h = _hash64(word.encode("utf-8"))
            bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
            acc += (bits * 2 - 1) * weight
        sig = 0
        for i in range(64):
            if acc[i] > 0:
                sig |= 1 << i
        sigs.append(np.int64(np.uint64(sig) >> np.uint64(1)))  # fit signed int64
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "simhash": pa.array(sigs, type=pa.int64()),
        }
    )


def simhash_signatures(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    )


def simhash_dup_pairs(
    docs: ray.data.Dataset, max_hamming: int = 3, chunks: int = 4
) -> ray.data.Dataset:
    """SimHash near-dup pairs: (a, b) with Hamming distance <= max_hamming.

    Pigeonhole banding: split the 63-bit signature into ``chunks`` bands —
    any pair within ``chunks - 1`` bit flips shares at least one exact
    band, so bucketing by (band, chunk-value) finds all candidates for
    ``max_hamming < chunks``; candidates are then verified exactly.
    Same shuffle shape as MinHash-LSH (bucket groupby + hot-bucket
    prefilter pattern kept implicit via bucket sizes).
    """
    assert max_hamming < chunks, "pigeonhole guarantee needs max_hamming < chunks"
    sigs = simhash_signatures(docs).materialize()
    bits_per_chunk = 64 // chunks

    def to_bands(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        hashes = batch.column("simhash").to_pylist()
        out_doc, out_band, out_val, out_sig = [], [], [], []
        for doc_id, sig in zip(doc_ids, hashes):
            for band in range(chunks):
                out_doc.append(doc_id)
                out_band.append(band)
                out_val.append((sig >> (band * bits_per_chunk)) & ((1 << bits_per_chunk) - 1))
                out_sig.append(sig)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "val": pa.array(out_val, type=pa.int64()),
                "simhash": pa.array(out_sig, type=pa.int64()),
            }
        )

    bands = sigs.map_batches(to_bands, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(group["doc_id"].tolist(), group["simhash"].tolist())))
        a_out, b_out = [], []
        for i, (da, sa) in enumerate(rows):
            for db, sb in rows[i + 1 :]:
                if bin(sa ^ sb).count("1") <= max_hamming:
                    a_out.append(da)
                    b_out.append(db)
        return pd.DataFrame(
            {"a": pd.Series(a_out, dtype="int64"), "b": pd.Series(b_out, dtype="int64")}
        )

    pairs = bands.groupby(["band", "val"]).map_groups(bucket_pairs, batch_format="pandas")
    return pairs.groupby(["a", "b"]).aggregate(Count()).select_columns(["a", "b"])


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, via shingle inverted index)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    n: int = 3,
    threshold: float = 0.5,
    max_posting: int = 1000,
) -> ray.data.Dataset:
    """Exact all-pairs word-n-gram Jaccard >= threshold, computed
    distributedly:

      1. explode distinct shingles per doc  (map, combined in-batch)
      2. groupby(shingle) -> per-posting pairs (hot shingles capped at
         ``max_posting`` — a stopword shingle otherwise emits |posting|²)
      3. groupby(pair) count = |A∩B|
      4. attach set sizes (broadcast small table) -> Jaccard filter

    Returns (a, b) with a < b. The SQL oracle mirrors steps 1-4 verbatim.
    """
    def shingle_rows(batch: pa.Table) -> pa.Table:
        out_doc, out_sh, out_size = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            shingles = word_shingles(text or "", n)
            for s in shingles:
                out_doc.append(doc_id)
                out_sh.append(s)
                out_size.append(len(shingles))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "shingle": pa.array(out_sh, type=pa.string()),
                "set_size": pa.array(out_size, type=pa.int64()),
            }
        )

    shingles = docs.select_columns(["doc_id", "text"]).map_batches(
        shingle_rows, batch_format="pyarrow"
    ).materialize()

    # vectorized pre-filter: shingles appearing in a single doc never form
    # a pair — keep the per-group Python path off them (same optimization
    # and scale caveat as minhash_candidate_pairs)
    counts = shingles.groupby("shingle").aggregate(Count())

    def only_multi(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch.column("count()"), 2))

    hot = {
        r["shingle"]
        for r in counts.map_batches(only_multi, batch_format="pyarrow").iter_rows()
    }
    hot_ref = ray.put(hot)

    def keep_hot(batch: pa.Table) -> pa.Table:
        hot_set = ray.get(hot_ref)
        mask = [s in hot_set for s in batch.column("shingle").to_pylist()]
        return batch.filter(pa.array(mask))

    shingles = shingles.map_batches(keep_hot, batch_format="pyarrow")

    def posting_to_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(
            set(zip(group["doc_id"].tolist(), group["set_size"].tolist()))
        )[:max_posting]
        a, b, sa, sb = [], [], [], []
        for i, (da, za) in enumerate(rows):
            for db, zb in rows[i + 1 :]:
                a.append(da); b.append(db); sa.append(za); sb.append(zb)
        return pd.DataFrame(
            {
                "a": pd.Series(a, dtype="int64"),
                "b": pd.Series(b, dtype="int64"),
                "size_a": pd.Series(sa, dtype="int64"),
                "size_b": pd.Series(sb, dtype="int64"),
            }
        )

    pair_partials = shingles.groupby("shingle").map_groups(
        posting_to_pairs, batch_format="pandas"
    )

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        inter = len(group)
        size_a = int(group["size_a"].iloc[0])
        size_b = int(group["size_b"].iloc[0])
        union = size_a + size_b - inter
        if union > 0 and inter / union >= threshold:
            return pd.DataFrame(
                {
                    "a": pd.Series([int(group["a"].iloc[0])], dtype="int64"),
                    "b": pd.Series([int(group["b"].iloc[0])], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
        )

    return pair_partials.groupby(["a", "b"]).map_groups(
        finalize, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    embeddings: ray.data.Dataset, threshold: float = 0.9
) -> ray.data.Dataset:
    """Near-duplicate (a, b) vector pairs with cosine >= threshold.

    Brute-force blockwise: the full normalized matrix is broadcast once via
    ``ray.put`` and every batch computes ``batch @ matrix.T`` (numpy) —
    zero per-batch reshipping. This is the exact baseline; the sublinear
    scale path is hyperplane-LSH bucketing (``embedding_lsh_buckets``).
    """
    rows = embeddings.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat_n = mat / norms
    mat_ref = ray.put((ids, mat_n))

    def block(batch: pa.Table) -> pa.Table:
        all_ids, matrix = ray.get(mat_ref)
        b_ids = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        b_mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        b_norms = np.linalg.norm(b_mat, axis=1, keepdims=True)
        b_norms[b_norms == 0] = 1.0
        sims = (b_mat / b_norms) @ matrix.T
        out_a, out_b = [], []
        for i, a in enumerate(b_ids):
            hits = np.nonzero(sims[i] >= threshold)[0]
            for j in hits:
                b = int(all_ids[j])
                if a < b:
                    out_a.append(int(a))
                    out_b.append(b)
        return pa.Table.from_pydict(
            {
                "a": pa.array(out_a, type=pa.int64()),
                "b": pa.array(out_b, type=pa.int64()),
            }
        )

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        block, batch_format="pyarrow"
    )


def embedding_lsh_buckets(
    embeddings: ray.data.Dataset, n_planes: int = 12
) -> ray.data.Dataset:
    """Hyperplane-LSH bucket assignment (scale path for near-dup / ANN):
    deterministic hyperplanes, one bucket id per vector; near-dup then
    reduces per bucket instead of all-pairs."""
    def assign(batch: pa.Table) -> pa.Table:
        mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        dim = mat.shape[1] if mat.ndim == 2 and mat.size else 64
        planes = np.array(
            [
                [
                    ((_hash64(f"plane-{p}-{d}".encode()) / 2**64) * 2.0 - 1.0)
                    for d in range(dim)
                ]
                for p in range(n_planes)
            ]
        )
        bits = (mat @ planes.T) > 0
        buckets = bits.dot(1 << np.arange(n_planes)).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "vec_id": batch.column("vec_id"),
                "bucket": pa.array(buckets, type=pa.int64()),
            }
        )

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )
