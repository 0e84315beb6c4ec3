"""Extraction (E1) tests: determinism / byte-identity, candidate merge
semantics, variant coverage."""

from __future__ import annotations

from ctinexus_ray.functions.extract import (
    extract_hybrid_content,
    extract_jsonld,
    extract_meta_description,
    is_cti_signal_line,
    merge_extraction_candidates,
)
from ctinexus_ray.sources.synth import make_cc_row, make_report_text


class TestByteIdentity:
    def test_deterministic_across_calls(self):
        for i in range(8):
            html = make_cc_row(i)["html"].decode()
            a = extract_hybrid_content(html)
            b = extract_hybrid_content(html)
            assert a == b  # byte-identical per url/html

    def test_recovers_report_content(self):
        for i in range(8):
            row = make_cc_row(i)
            out = extract_hybrid_content(row["html"].decode())
            flat = " ".join(out["text"].splitlines())
            # every sentence of the original text survives extraction
            for sentence in row["text"].split(". "):
                assert sentence.rstrip(".") in flat

    def test_boilerplate_removed(self):
        row = make_cc_row(0)
        out = extract_hybrid_content(row["html"].decode())
        low = out["text"].lower()
        assert "subscribe" not in low
        assert "cookie" not in low
        assert "all rights reserved" not in low


class TestCandidates:
    def test_jsonld(self):
        html = (
            '<html><head><script type="application/ld+json">'
            '{"@type": "Article", "articleBody": "CTI body text", '
            '"headline": "T", "author": {"name": "A"}, "datePublished": "2024-01-02"}'
            "</script></head><body></body></html>"
        )
        out = extract_jsonld(html)
        assert out["text"] == "CTI body text"
        assert out["title"] == "T"
        assert out["author"] == "A"
        assert out["date"] == "2024-01-02"

    def test_meta_description(self):
        html = '<html><head><meta name="description" content="desc here"></head></html>'
        assert extract_meta_description(html) == "desc here"

    def test_merge_priority_and_signal_gate(self):
        candidates = [
            {"source": "meta_description", "text": "ransomware extra line", "length": 21},
            {"source": "body", "text": "base line one\nbase line two", "length": 27},
        ]
        merged = merge_extraction_candidates(candidates)
        lines = merged.splitlines()
        # body is the base (priority 0); the CTI-signal meta line is appended
        assert lines[0] == "base line one"
        assert "ransomware extra line" in lines

    def test_merge_drops_non_signal_secondary_lines(self):
        candidates = [
            {"source": "body", "text": "base", "length": 4},
            {"source": "meta_description", "text": "short fluff", "length": 11},
        ]
        merged = merge_extraction_candidates(candidates)
        assert "short fluff" not in merged

    def test_cap_at_word_boundary(self):
        text = "ransomware " * 4000
        merged = merge_extraction_candidates(
            [{"source": "body", "text": text.strip(), "length": len(text)}],
            max_chars=100,
        )
        assert len(merged) <= 100 and not merged.endswith(" ")


class TestSignalLine:
    def test_strong_terms(self):
        assert is_cti_signal_line("New ransomware campaign observed")
        assert is_cti_signal_line("exploited CVE-2024-1234 in the wild")

    def test_drop_patterns(self):
        assert not is_cti_signal_line("Subscribe to updates about ransomware")
        assert not is_cti_signal_line("Figure 3 shows the attack chain")

    def test_long_sentence_kept(self):
        line = "The operators moved through the environment deliberately, " \
               "staging data in archives before sending it out of the network."
        assert is_cti_signal_line(line)

    def test_short_neutral_dropped(self):
        assert not is_cti_signal_line("Just a short line")
