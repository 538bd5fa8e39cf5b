"""e2e at n=128: first size where the NUM_CHECK_AUDIT sampling branch
runs (a level of 128 blocks has 2l = 256 > 128 candidates, so the audit
samples 128 random indices instead of taking every block —
reference Server.hpp:604-666, porla_tpu/protocol/auditing.py:61-73),
and folds reach level 6 during the update ladder."""

import pytest

from porla_tpu.config import NUM_CHECK_AUDIT, PorlaConfig
from porla_tpu.protocol.auditing import build_audit_plan
from porla_tpu.protocol.client import PorlaClient
from porla_tpu.protocol.server import PorlaServer
from porla_tpu.protocol.transport import InProcTransport

# compile-heavy: nightly tier (see pyproject markers)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    cfg = PorlaConfig(scheme="ipa",
                      storage_dir=str(tmp_path_factory.mktemp("store")))
    server = PorlaServer(cfg)
    client = PorlaClient(cfg, InProcTransport(server),
                         data_seed=bytes([3] * 16))
    client.initialize(128)
    return client, server


def test_sampling_branch_is_exercised(pair):
    client, server = pair
    plan = build_audit_plan(bytes(16), server.write_step, 128,
                            server.height)
    top = [s for s in plan.samples if s.level == server.height - 1]
    # the top level contributes exactly NUM_CHECK_AUDIT sampled blocks,
    # not all 256
    assert len(top) == NUM_CHECK_AUDIT
    assert any(s.index != i for i, s in enumerate(top))


def test_audit_after_initialize(pair):
    client, server = pair
    client.audit(seed=bytes([9] * 16))


def test_updates_fold_deep_and_audit(pair):
    client, server = pair
    # 8 writes fold through levels 0..3
    for i in range(8):
        client.update(i + 1)
    assert not server.levels[3].empty
    client.audit()
