"""End-to-end KZG-scheme protocol (the reference's ENABLE_KZG build):
BN254 MACs, client-side trusted setup, SRS commitments, pairing-verified
openings."""

import pytest

from porla_tpu.config import PorlaConfig
from porla_tpu.protocol.client import AuditError, PorlaClient
from porla_tpu.protocol.server import PorlaServer
from porla_tpu.protocol.transport import InProcTransport

# compile-heavy: nightly tier (see pyproject markers)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    cfg = PorlaConfig(scheme="kzg",
                      storage_dir=str(tmp_path_factory.mktemp("store")))
    server = PorlaServer(cfg)
    client = PorlaClient(cfg, InProcTransport(server),
                         data_seed=bytes([3] * 16))
    client.initialize(8)
    return client, server


def test_kzg_audit_after_initialize(pair):
    client, server = pair
    client.audit(seed=bytes(range(16)))


def test_kzg_updates_and_audit(pair):
    client, server = pair
    client.update(1)
    client.update(2)
    client.audit()


def test_kzg_corruption_detected(pair):
    client, server = pair
    top = server.levels[server.height - 1]
    orig = top.x.data.q.copy()
    bad = orig.copy()
    bad[0, 0, 0] ^= 1
    top.x.data = type(top.x.data)(top.x.data.p, bad)
    with pytest.raises(AssertionError):
        client.audit()
    top.x.data = type(top.x.data)(top.x.data.p, orig)
    client.audit()
