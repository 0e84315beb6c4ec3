"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session")
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def config():
    from ctinexus_ray.config import PipelineConfig

    return PipelineConfig(llm_concurrency=(1, 2), doc_batch_size=32)


@pytest.fixture(scope="session")
def mock_client(config):
    from ctinexus_ray.llm.client import get_client

    return get_client(config)


@pytest.fixture(scope="session")
def demos():
    from ctinexus_ray.sources.demos import select_demos
    from ctinexus_ray.sources.synth import make_demo_corpus

    return select_demos(make_demo_corpus(8))


@pytest.fixture()
def typed_triplets():
    """ET-stage sample matching the reference IR fixtures
    (reference tests/conftest.py:10-203 shape)."""
    return [
        {
            "subject": {"text": "ShadowPulse", "class": "Malware"},
            "relation": "exploits",
            "object": {"text": "CVE-2023-1234", "class": "Vulnerability"},
        },
        {
            "subject": {"text": "ShadowPulse", "class": "Malware"},
            "relation": "communicates with",
            "object": {"text": "192.168.1.100", "class": {"Indicator": "IP"}},
        },
        {
            "subject": {"text": "Storm-1417", "class": "Attacker"},
            "relation": "deploys",
            "object": {"text": "ShadowPulse malware", "class": "Malware"},
        },
    ]
