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


class TestTrafilaturaBackend:
    """Reference-parity extraction backend (VERDICT r1 item 9): the
    trafilatura candidate trio behind the same merge semantics. Skipped
    wherever the dependency is absent (this sandbox); the moment it is
    installable these prove the byte-parity invariant vs the reference's
    extract_hybrid_content (ctinexus/llm_processor.py:361-417)."""

    GOLDEN_HTML = (
        "<html><head><title>Threat Report</title>"
        '<meta name="description" content="APT29 deployed new malware.">'
        '<script type="application/ld+json">{"@type": "Article", '
        '"articleBody": "APT29 used Mimikatz to dump credentials from '
        '10.0.0.5 during the campaign.", "headline": "Threat Report"}'
        "</script></head><body><article><p>APT29 used Mimikatz to dump "
        "credentials from 10.0.0.5 during the campaign.</p><p>The actor "
        "exfiltrated data to evil.example.com over HTTPS.</p></article>"
        "</body></html>"
    )

    def test_unknown_backend_rejected(self):
        import pytest

        from ctinexus_ray.functions.extract import extract_hybrid_content

        with pytest.raises(ValueError, match="backend"):
            extract_hybrid_content("<html></html>", backend="lynx")

    def test_trafilatura_backend_requires_dependency(self):
        import pytest

        from ctinexus_ray.functions.extract import (
            extract_hybrid_content,
            trafilatura_available,
        )

        if trafilatura_available():
            pytest.skip("covered by test_trafilatura_golden_parity")
        with pytest.raises(ImportError):
            extract_hybrid_content(self.GOLDEN_HTML, backend="trafilatura")

    def test_trafilatura_golden_parity(self):
        import pytest

        from ctinexus_ray.functions.extract import (
            extract_hybrid_content,
            trafilatura_available,
        )

        if not trafilatura_available():
            pytest.skip("trafilatura not installed in this environment")
        out = extract_hybrid_content(self.GOLDEN_HTML, backend="trafilatura")
        # same merge semantics as the reference: highest-priority
        # candidate is the base, secondary candidates pass the CTI gate
        assert "Mimikatz" in out["text"]
        assert out["title"] == "Threat Report"
        sources = {c["source"] for c in out["candidates"]}
        assert sources & {"trafilatura_json", "trafilatura_txt", "trafilatura_bare"}
        # byte-identity across runs
        again = extract_hybrid_content(self.GOLDEN_HTML, backend="trafilatura")
        assert again["text"] == out["text"]
