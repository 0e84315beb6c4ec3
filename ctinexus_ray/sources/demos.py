"""Few-shot demonstration retrieval (operators S3/M2/K1 in SURVEY §2).

The reference builds a TF-IDF index over its 148-report demo corpus with
sklearn and returns kNN demos (reference ctinexus/llm_processor.py:
1275-1386). Two load-bearing quirks (SURVEY §2.11):

  * Q1 — retrieval is QUERY-INDEPENDENT: the reference vectorizes only the
    demo corpus and takes the neighbors of corpus index 0, so the selected
    demos are a constant per corpus. We therefore compute the selection
    once on the driver and broadcast the chosen demo list to IE actors
    (``ray.put`` / constructor arg) — no index ships with the tasks.
  * with ``permutation == "asc"`` the top-k list is reversed
    (reference :1349-1353).

sklearn/nltk are unavailable here, so TF-IDF + cosine and an English
stopword list are implemented with numpy directly.
"""

from __future__ import annotations

import json
import math
import re
from collections import Counter
from pathlib import Path

import numpy as np

_TOKEN_RE = re.compile(r"[A-Za-z][A-Za-z0-9']+")

# compact English stopword list (nltk is unavailable; reference lazily
# downloads nltk stopwords at ctinexus/llm_processor.py:59-78)
STOPWORDS = frozenset(
    """a about above after again against all am an and any are as at be because
been before being below between both but by could did do does doing down
during each few for from further had has have having he her here hers herself
him himself his how i if in into is it its itself just me more most my myself
no nor not now of off on once only or other our ours ourselves out over own
same she should so some such than that the their theirs them themselves then
there these they this those through to too under until up very was we were
what when where which while who whom why will with you your yours yourself
yourselves""".split()
)


def clean_tokens(text: str) -> list[str]:
    return [
        t.lower() for t in _TOKEN_RE.findall(text) if t.lower() not in STOPWORDS
    ]


def tfidf_matrix(texts: list[str]) -> np.ndarray:
    """Dense L2-normalized TF-IDF (smooth idf). Rows align with ``texts``."""
    token_lists = [clean_tokens(t) for t in texts]
    vocab: dict[str, int] = {}
    for tokens in token_lists:
        for tok in tokens:
            if tok not in vocab:
                vocab[tok] = len(vocab)
    n_docs, n_terms = len(texts), max(len(vocab), 1)
    mat = np.zeros((n_docs, n_terms), dtype=np.float64)
    df = np.zeros(n_terms, dtype=np.float64)
    for i, tokens in enumerate(token_lists):
        counts = Counter(tokens)
        for tok, c in counts.items():
            mat[i, vocab[tok]] = c
        for tok in counts:
            df[vocab[tok]] += 1
    idf = np.log((1 + n_docs) / (1 + df)) + 1.0
    mat *= idf
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class DemoRetriever:
    """kNN demo selection over a demo corpus of
    ``{"name", "text", "triplets"}`` records."""

    def __init__(self, corpus: list[dict], shot: int = 3, permutation: str = "asc"):
        if not corpus:
            raise ValueError("demo corpus is empty")
        self.corpus = corpus
        self.shot = shot
        self.permutation = permutation
        self._matrix = tfidf_matrix([d["text"] for d in corpus])

    def most_similar_to(self, index: int) -> list[int]:
        sims = self._matrix @ self._matrix[index]
        order = np.argsort(sims)[::-1]
        return [int(i) for i in order if i != index]

    def retrieve(self, query: str | None = None) -> list[dict]:
        """Select ``shot`` demos. ``query`` is accepted for interface
        compatibility but IGNORED — faithful to quirk Q1: the reference
        always returns the neighbors of corpus document 0."""
        neighbors = self.most_similar_to(0)[: self.shot]
        if self.permutation == "asc":
            neighbors = list(reversed(neighbors))
        return [self.corpus[i] for i in neighbors]


def load_demo_corpus(directory: str | Path) -> list[dict]:
    """Load ``{text, explicit_triplets}`` JSON records (the reference's
    annotation format, ctinexus/data/README.md:3-8) from a directory in
    SORTED filename order (the reference depends on ``os.listdir`` order —
    we document and fix the order instead)."""
    corpus = []
    for path in sorted(Path(directory).glob("*.json")):
        with open(path, encoding="utf-8") as fh:
            record = json.load(fh)
        text = record.get("text", "")
        triplets = record.get("explicit_triplets", record.get("triplets", []))
        if text:
            corpus.append({"name": path.name, "text": text, "triplets": triplets})
    return corpus


def select_demos(
    corpus: list[dict], shot: int = 3, permutation: str = "asc"
) -> list[dict]:
    """One-shot driver-side demo selection (constant per corpus — Q1)."""
    return DemoRetriever(corpus, shot=shot, permutation=permutation).retrieve()
