"""End-to-end protocol test: initialize -> updates -> audits.

The audit equation alpha*commitment + complements == MAC + alpha*align is
self-verifying: a passing audit proves the entire stack (NTT encode, MAC
mirror butterflies, alignment corrections, commitments, PRF complements,
IPA transcript) coheres. The reference only has this as a fatal runtime
CHECK (Client.hpp:829); here it is the top of the test pyramid.
"""

import numpy as np
import pytest

from porla_tpu.config import PorlaConfig
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
                         data_seed=bytes(range(16)))
    client.initialize(8)
    return client, server


def test_audit_after_initialize(pair):
    client, server = pair
    client.audit(seed=bytes(range(16)))


def test_updates_and_audits(pair):
    client, server = pair
    # a few writes exercise HAdd folds of levels 0..2
    for i in range(3):
        client.update(i + 1)
        client.audit()


def test_full_epoch_triggers_crebuild(pair):
    client, server = pair
    while client.write_step % client.num_blocks != client.num_blocks - 1:
        client.update((client.write_step % client.num_blocks) + 1)
    # the next update completes the epoch -> CRebuild on both sides
    client.update(client.num_blocks)
    assert server.write_step % server.num_blocks == 0
    client.audit()


def test_corruption_is_detected(pair):
    client, server = pair
    # Corrupt one codeword chunk on the server and expect the audit to
    # fail. Note: the corruption must change the value mod q — the
    # audit-time align_MAC recommits the mod-p correction from the
    # *current* data, so corruption by a multiple of q (here: touching
    # only the p-lane) cancels out of the MAC equation. That mirrors the
    # reference exactly: its align_MAC (Server.hpp:478-562) makes
    # add-multiple-of-q corruption equally invisible to the audit
    # equation; soundness rides on the q-residues.
    top = server.levels[server.height - 1]
    orig = top.x.data.q.copy()
    bad = orig.copy()
    bad[0, 0, 0] ^= 1
    top.x.data = type(top.x.data)(top.x.data.p, bad)
    with pytest.raises(AssertionError):
        client.audit()
    top.x.data = type(top.x.data)(top.x.data.p, orig)
    client.audit()  # back to healthy


def test_post_epoch_update_and_audit(pair):
    """Regression (round-4 soak): audit ONE aligned update PAST the
    epoch CRebuild. This is the state the misaligned soak warm-up
    silently corrupted — the CRebuild regenerates U complements from
    canonical round-robin times (Client.hpp:483-499), so the update
    after it must continue the rotation."""
    client, server = pair
    client.update((client.write_step % client.num_blocks) + 1)
    client.audit()


def test_misaligned_update_rejected(pair):
    """The complement scheme supports ONLY round-robin updates; the
    reference silently corrupts future epochs on any other order — we
    raise a typed error at the call site instead, and the client state
    stays usable."""
    from porla_tpu.protocol.client import UpdateOrderError
    client, server = pair
    n = client.num_blocks
    expected = (client.write_step % n) + 1
    wrong = expected % n + 1  # any other id
    with pytest.raises(UpdateOrderError):
        client.update(wrong)
    client.update(expected)  # rotation unbroken
    client.audit()
