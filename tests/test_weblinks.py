"""Hyperlink extraction + host link-graph tests (ops/weblinks.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from ctinexus_ray.ops.weblinks import (
    extract_links,
    host_link_graph,
    resolve_links,
)


def _resolve_one(raw: str, scheme="https", host="ex.com") -> str | None:
    out = resolve_links(
        pa.array([raw], type=pa.string()),
        pa.array([scheme], type=pa.string()),
        pa.array([host], type=pa.string()),
    )
    return out[0].as_py()


class TestResolveLinks:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            # absolute http(s) pass through untouched (incl. case/query)
            ("http://other.org/a?x=1", "http://other.org/a?x=1"),
            ("https://other.org/", "https://other.org/"),
            # scheme-relative inherits the page scheme
            ("//cdn.ex.com/lib.js", "https://cdn.ex.com/lib.js"),
            # root-relative resolves against scheme://host
            ("/about", "https://ex.com/about"),
            ("/", "https://ex.com/"),
            # dropped forms
            ("mailto:a@b.c", None),
            ("javascript:void(0)", None),
            ("#frag", None),
            ("../up/one", None),
            ("relative/path", None),
            ("", None),
        ],
    )
    def test_cases(self, raw, expected):
        assert _resolve_one(raw) == expected

    def test_http_page_scheme_relative(self):
        assert _resolve_one("//c.d/e", scheme="http") == "http://c.d/e"

    def test_non_http_page_origin_drops_relatives(self):
        # a page whose url has no http(s) origin can't anchor relatives
        out = resolve_links(
            pa.array(["/x", "http://a.b/c"], type=pa.string()),
            pa.array([None, None], type=pa.string()),
            pa.array([None, None], type=pa.string()),
        )
        assert out.to_pylist() == [None, "http://a.b/c"]


class TestExtractLinks:
    def _pages(self):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                    "url": [
                        "http://a.com/p/1",
                        "https://b.com/x",
                        "http://c.com/",
                        "http://d.com/",
                    ],
                    "html": [
                        '<a href="http://z.org/1">x</a><a href="/l">y</a>',
                        '<a href="mailto:m@n.o">m</a><a href="//cdn.b.com/s">c</a>',
                        "<p>no links</p>",
                        None,
                    ],
                }
            )
        )

    def test_explode_resolution_and_idx(self, ray_session):
        rows = sorted(
            extract_links(self._pages()).take_all(),
            key=lambda r: (r["doc_id"], r["idx"]),
        )
        assert [(r["doc_id"], r["idx"], r["link"]) for r in rows] == [
            (1, 1, "http://z.org/1"),
            (1, 2, "http://a.com/l"),
            (2, 1, "https://cdn.b.com/s"),
        ]

    def test_binary_html_decodes(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([9], type=pa.int64()),
                    "url": ["http://a.com/"],
                    "html": pa.array(
                        [b'\xff\xfe<a href="http://x.y/z">q</a>'],
                        type=pa.binary(),
                    ),
                }
            )
        )
        rows = extract_links(ds).take_all()
        assert len(rows) == 1 and rows[0]["link"] == "http://x.y/z"

    def test_host_graph_counts(self, ray_session):
        links = extract_links(self._pages())
        g = {
            (r["src_host"], r["dst_host"]): r["n_links"]
            for r in host_link_graph(links, num_partitions=16).take_all()
        }
        assert g == {
            ("a.com", "z.org"): 1,
            ("a.com", "a.com"): 1,
            ("b.com", "cdn.b.com"): 1,
        }

    def test_path_prefix_counts(self, ray_session):
        from ctinexus_ray.ops.weblinks import path_prefix_counts

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "url": [
                        "http://a.com/x/y",
                        "http://a.com/x",
                        "http://a.com/",
                        "http://a.com",          # no path -> '/'
                        "http://b.com//x//?q=1",  # empty segs collapse
                        "ftp://c.com/skip",       # non-http skipped
                        None,
                    ]
                }
            )
        )
        got = {
            (r["host"], r["prefix"]): r["n_pages"]
            for r in path_prefix_counts(ds, num_partitions=16).take_all()
        }
        assert got == {
            ("a.com", "/"): 4,
            ("a.com", "/x"): 2,
            ("a.com", "/x/y"): 1,
            ("b.com", "/"): 1,
            ("b.com", "/x"): 1,
        }

    def test_single_quoted_href_not_matched(self, ray_session):
        # the contract is the double-quoted form only (documented);
        # single-quoted attributes must not produce phantom links
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1], type=pa.int64()),
                    "url": ["http://a.com/"],
                    "html": ["<a href='http://x.y/z'>q</a>"],
                }
            )
        )
        assert extract_links(ds).count() == 0


class TestRobots:
    TXT = (
        "# comment\n"
        "User-agent: googlebot\n"
        "Disallow: /private\n"
        "Crawl-delay: 2\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /a\n"
        "Allow: /a/b\n"
        "Disallow: /x$\n"
        "Disallow:\n"
        "Crawl-delay: 1.5\n"
    )

    def test_group_selection(self):
        from ctinexus_ray.ops.weblinks import parse_robots

        star = parse_robots(self.TXT)
        assert star["rules"] == [(False, "/a"), (True, "/a/b"), (False, "/x$")]
        assert star["crawl_delay"] == 1.5
        goog = parse_robots(self.TXT, agent="googlebot")
        assert goog["rules"] == [(False, "/private")]
        assert goog["crawl_delay"] == 2.0
        # unknown agent falls back to the * group
        other = parse_robots(self.TXT, agent="bingbot")
        assert other["rules"] == star["rules"]

    def test_longest_match_and_anchor(self):
        from ctinexus_ray.ops.weblinks import _RobotsIndex, parse_robots

        idx = _RobotsIndex({"h": parse_robots(self.TXT)})
        assert not idx.allowed("h", "/a/5")
        assert idx.allowed("h", "/a/b/c")  # longer Allow overrides
        assert not idx.allowed("h", "/x")  # $ anchor hits
        assert idx.allowed("h", "/xy")  # $ anchor misses
        assert idx.allowed("nothost", "/anything")  # no robots: allowed

    def test_wildcard_rules(self):
        from ctinexus_ray.ops.weblinks import _RobotsIndex, parse_robots

        idx = _RobotsIndex(
            {"h": parse_robots("User-agent: *\nDisallow: /*/c\nAllow: /a/c$\n")}
        )
        assert not idx.allowed("h", "/b/c")
        assert idx.allowed("h", "/a/c")  # longer anchored Allow wins
        assert not idx.allowed("h", "/a/cd")  # Allow anchor misses
        assert idx.allowed("h", "/c")  # /*/c needs a middle segment

    def test_sitemap_directives_collected(self):
        from ctinexus_ray.ops.weblinks import parse_robots

        txt = (
            "Sitemap: http://h/a.xml\n"
            "User-agent: special\nDisallow: /\n"
            "Sitemap: http://h/b.xml\n"
            "User-agent: *\nDisallow: /x\n"
        )
        # sitemap lines are NOT group-scoped (RFC 9309 2.3): both
        # collected for every agent
        for agent in ("*", "special", "unknown"):
            assert parse_robots(txt, agent=agent)["sitemaps"] == [
                "http://h/a.xml",
                "http://h/b.xml",
            ]

    def test_multi_agent_group_header(self):
        from ctinexus_ray.ops.weblinks import parse_robots

        txt = "User-agent: a\nUser-agent: b\nDisallow: /z\n"
        assert parse_robots(txt, agent="b")["rules"] == [(False, "/z")]
        # consecutive User-agent lines form ONE group
        assert parse_robots(txt, agent="a")["rules"] == [(False, "/z")]
        # no * group at all: unknown agent gets no rules (allow all)
        assert parse_robots(txt, agent="zz")["rules"] == []

    def test_dataset_filter_and_refusal(self, ray_session):
        import pyarrow as pa
        import pytest
        import ray.data

        from ctinexus_ray.ops.weblinks import robots_allowed

        pages = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "url": [
                        "http://h.example.com/a/1",
                        "http://h.example.com/a/b/2",
                        "http://other.com/a/1",
                        "garbage-no-scheme",
                    ]
                }
            )
        )
        robots = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "host": ["h.example.com"],
                    "robots_txt": ["User-agent: *\nDisallow: /a\nAllow: /a/b\n"],
                }
            )
        )
        rows = {r["url"]: r["allowed"] for r in robots_allowed(pages, robots).take_all()}
        assert rows == {
            "http://h.example.com/a/1": False,
            "http://h.example.com/a/b/2": True,
            "http://other.com/a/1": True,
            "garbage-no-scheme": True,
        }
        with pytest.raises(ValueError, match="max_hosts"):
            robots_allowed(pages, robots, max_hosts=0)


class TestRobotsHostAndAgentNormalization:
    """ADVICE round-4 items: case/port/userinfo host matching and RFC
    9309 product-token agent matching must not silently default."""

    ROBOTS = "User-agent: *\nDisallow: /private\n"

    def test_normalize_host(self):
        from ctinexus_ray.ops.weblinks import normalize_host

        assert normalize_host("Host3.Example.COM") == "host3.example.com"
        assert normalize_host("host3.example.com:8080") == "host3.example.com"
        assert normalize_host("user:pw@Host.example.com:443") == "host.example.com"
        assert normalize_host("[::1]:8080") == "[::1]"
        assert normalize_host("[2001:DB8::1]") == "[2001:db8::1]"

    def test_index_matches_cased_and_ported_hosts(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.weblinks import robots_allowed

        pages = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "url": [
                        "http://Host3.example.com/private/x",
                        "http://host3.example.com:8080/private/x",
                        "http://u:p@host3.example.com/private/x",
                        "http://host3.example.com/public",
                    ]
                }
            )
        )
        robots = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"host": ["HOST3.Example.com"], "robots_txt": [self.ROBOTS]}
            )
        )
        rows = {
            r["url"]: r["allowed"]
            for r in robots_allowed(pages, robots).take_all()
        }
        assert rows == {
            "http://Host3.example.com/private/x": False,
            "http://host3.example.com:8080/private/x": False,
            "http://u:p@host3.example.com/private/x": False,
            "http://host3.example.com/public": True,
        }

    def test_product_token_agent_matching(self):
        from ctinexus_ray.ops.weblinks import parse_robots

        txt = (
            "User-agent: FooBot\nDisallow: /foo\n\n"
            "User-agent: *\nDisallow: /all\n"
        )
        # versioned caller UA matches the bare product-token group
        for agent in ("FooBot/1.0", "foobot", "FOOBOT/2.3-beta"):
            got = parse_robots(txt, agent=agent)
            assert got["rules"] == [(False, "/foo")], agent
        # robots side carrying a version still groups by product token
        txt2 = "User-agent: FooBot/2.1\nDisallow: /foo\n"
        assert parse_robots(txt2, agent="FooBot")["rules"] == [(False, "/foo")]
        # non-matching agent falls back to *
        assert parse_robots(txt, agent="BarBot/1.0")["rules"] == [
            (False, "/all")
        ]


class TestRobotsAuthorityScope:
    def test_distinct_ports_keep_distinct_policies(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.weblinks import robots_allowed

        pages = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "url": [
                        "http://example.com/x",
                        "http://example.com:8443/x",
                        "http://example.com:9999/x",  # no row: bare fallback
                    ]
                }
            )
        )
        robots = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "host": ["example.com", "example.com:8443"],
                    "robots_txt": [
                        "User-agent: *\nDisallow: /\n",
                        "User-agent: *\nAllow: /\n",
                    ],
                }
            )
        )
        rows = {
            r["url"]: r["allowed"]
            for r in robots_allowed(pages, robots).take_all()
        }
        assert rows == {
            "http://example.com/x": False,
            "http://example.com:8443/x": True,
            "http://example.com:9999/x": False,  # falls back to bare host
        }

    def test_colliding_authorities_refuse(self):
        import pytest as _pytest

        from ctinexus_ray.ops.weblinks import _RobotsIndex, parse_robots

        with _pytest.raises(ValueError, match="normalizes to"):
            _RobotsIndex(
                {
                    "Example.com": parse_robots("User-agent: *\nDisallow: /"),
                    "example.com": parse_robots("User-agent: *\nAllow: /"),
                }
            )
