"""Tests for the per-document KG semantics (preprocess / merge / postprocess
/ graph analysis), mirroring reference tests/unit/test_cti_processor.py and
test_graph_constructor.py behaviors."""

from __future__ import annotations

from ctinexus_ray.stages.docops import (
    analyze_graph,
    collect_mention_texts,
    merge_doc,
    postprocess_doc,
    preprocess_doc,
)


class TestPreprocess:
    def test_mention_ids_first_seen(self, typed_triplets):
        aligned, mentions_num, dropped = preprocess_doc(typed_triplets)
        assert dropped == 0
        assert mentions_num == 5
        # first-seen numbering: ShadowPulse=0, CVE=1, ip=2, Storm=3, variant=4
        assert aligned[0]["subject"]["mention_id"] == 0
        assert aligned[1]["subject"]["mention_id"] == 0  # same text, same id
        assert aligned[0]["object"]["mention_id"] == 1
        assert aligned[2]["subject"]["mention_id"] == 3

    def test_field_renames(self, typed_triplets):
        aligned, _, _ = preprocess_doc(typed_triplets)
        node = aligned[0]["subject"]
        assert node["mention_text"] == "ShadowPulse"
        assert node["mention_class"] == "Malware"
        assert "text" not in node and "class" not in node

    def test_dict_class_flattened(self, typed_triplets):
        aligned, _, _ = preprocess_doc(typed_triplets)
        assert aligned[1]["object"]["mention_class"] == "Indicator"

    def test_invalid_dropped(self):
        bad = [{"subject": {"text": ""}, "relation": "r", "object": {"text": "b"}}]
        aligned, n, dropped = preprocess_doc(bad)
        assert aligned == [] and n == 0 and dropped == 1


def _mk_aligned(entries):
    """entries: list of (s_text, s_class, rel, o_text, o_class)."""
    triplets = [
        {
            "subject": {"text": s, "class": sc},
            "relation": r,
            "object": {"text": o, "class": oc},
        }
        for s, sc, r, o, oc in entries
    ]
    aligned, _, _ = preprocess_doc(triplets)
    return aligned


class TestMerge:
    def test_similar_mentions_merge(self):
        aligned = _mk_aligned(
            [
                ("ShadowPulse", "Malware", "uses", "Mimikatz", "Tool"),
                ("ShadowPulse malware", "Malware", "targets", "finance", "Location"),
            ]
        )
        texts = collect_mention_texts(aligned)
        # identical embeddings for the two ShadowPulse variants
        emb = {0: [1.0, 0.0], 1: [0.0, 1.0], 2: [1.0, 0.01], 3: [0.5, 0.5]}
        merged, entity_num, dropped = merge_doc(aligned, emb, 0.9)
        assert dropped == 0
        by_text = {
            n["mention_text"]: n
            for t in merged
            for n in (t["subject"], t["object"])
        }
        assert (
            by_text["ShadowPulse"]["entity_id"]
            == by_text["ShadowPulse malware"]["entity_id"]
        )
        assert by_text["ShadowPulse"]["mention_merged"] == ["ShadowPulse malware"]
        # canonical text: equal frequency -> set-iteration-order stable pick
        assert by_text["ShadowPulse"]["entity_text"] in (
            "ShadowPulse", "ShadowPulse malware",
        )
        assert texts[0] == "ShadowPulse"

    def test_dissimilar_stay_separate(self):
        aligned = _mk_aligned(
            [
                ("alpha", "Malware", "uses", "beta", "Malware"),
            ]
        )
        emb = {0: [1.0, 0.0], 1: [0.0, 1.0]}
        merged, entity_num, _ = merge_doc(aligned, emb, 0.6)
        subj = merged[0]["subject"]
        obj = merged[0]["object"]
        assert subj["entity_id"] != obj["entity_id"]
        assert entity_num == 2
        assert subj["mention_merged"] == [] and obj["mention_merged"] == []

    def test_singletons_get_ids_in_class_order(self):
        aligned = _mk_aligned(
            [
                ("a", "Malware", "uses", "b", "Tool"),
                ("c", "Location", "targets", "a", "Malware"),
            ]
        )
        # three distinct mentions (a reused) -> three singleton class groups
        emb = {i: [1.0 if j == i else 0.0 for j in range(3)] for i in range(3)}
        merged, entity_num, _ = merge_doc(aligned, emb, 0.6)
        assert entity_num == 3
        nodes = {n["mention_text"]: n["entity_id"]
                 for t in merged for n in (t["subject"], t["object"])}
        # entity ids assigned in class first-seen order:
        # Malware(a)=0, Tool(b)=1, Location(c)=2
        assert nodes["a"] == 0
        assert nodes["b"] == 1
        assert nodes["c"] == 2

    def test_empty(self):
        merged, entity_num, dropped = merge_doc([], {}, 0.6)
        assert merged == [] and entity_num == 0


class TestPostprocess:
    def test_all_ioc_cluster_unmerged(self):
        aligned = _mk_aligned(
            [
                ("192.168.1.1", "Indicator", "connects to", "10.0.0.1", "Indicator"),
            ]
        )
        # force-merge the two IPs
        emb = {0: [1.0, 0.0], 1: [1.0, 0.0]}
        merged, entity_num, _ = merge_doc(aligned, emb, 0.6)
        subj = merged[0]["subject"]
        assert subj["mention_merged"]  # merged before postprocess
        new_entity_num = postprocess_doc(merged, entity_num)
        assert merged[0]["subject"]["mention_merged"] == []
        assert merged[0]["object"]["mention_merged"] == []
        # the two IPs are separate entities again
        assert merged[0]["subject"]["entity_id"] != merged[0]["object"]["entity_id"]
        assert new_entity_num >= entity_num

    def test_partial_ioc_cluster_untouched(self):
        aligned = _mk_aligned(
            [
                ("192.168.1.1", "Indicator", "connects to", "server", "Indicator"),
            ]
        )
        emb = {0: [1.0, 0.0], 1: [1.0, 0.0]}
        merged, entity_num, _ = merge_doc(aligned, emb, 0.6)
        before = [dict(merged[0]["subject"]), dict(merged[0]["object"])]
        new_entity_num = postprocess_doc(merged, entity_num)
        # partially-IOC cluster: explicit no-op (reference TODO branch)
        assert merged[0]["subject"] == before[0]
        assert merged[0]["object"] == before[1]
        assert new_entity_num == entity_num


class TestAnalyzeGraph:
    def _aligned_with_ids(self, edges):
        """edges: list of (s_id, o_id); text = str(id)."""
        return [
            {
                "subject": {
                    "mention_id": s, "mention_text": f"e{s}", "mention_class": "X",
                    "entity_id": s, "entity_text": f"e{s}", "mention_merged": [],
                },
                "relation": "r",
                "object": {
                    "mention_id": o, "mention_text": f"e{o}", "mention_class": "X",
                    "entity_id": o, "entity_text": f"e{o}", "mention_merged": [],
                },
            }
            for s, o in edges
        ]

    def test_components_and_topic(self):
        # component A: 0-1, 0-2 (0 has degree 2); component B: 3-4
        analysis = analyze_graph(self._aligned_with_ids([(0, 1), (0, 2), (3, 4)]))
        assert len(analysis["subgraphs"]) == 2
        assert sorted(map(sorted, analysis["subgraphs"])) == [[0, 1, 2], [3, 4]]
        assert analysis["topic_node"]["entity_id"] == 0
        # main nodes exclude the topic node's component winner
        assert [n["entity_id"] for n in analysis["main_nodes"]] == [3]

    def test_empty(self):
        analysis = analyze_graph([])
        assert analysis["topic_node"]["entity_id"] == -1
        assert analysis["subgraphs"] == []

    def test_long_chain_no_recursion_error(self):
        # the reference's recursive DFS would hit the recursion limit here
        edges = [(i, i + 1) for i in range(3000)]
        analysis = analyze_graph(self._aligned_with_ids(edges))
        assert len(analysis["subgraphs"]) == 1
        assert len(analysis["subgraphs"][0]) == 3001
