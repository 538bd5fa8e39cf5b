"""Checkpoint/resume: a restored server must keep answering updates and
audits for the same client state (the reference has serialization
helpers, utils.h:212-232/400-471, but no resume path — here it is a
first-class subsystem)."""

import tempfile

from porla_tpu.config import PorlaConfig
from porla_tpu.protocol.client import PorlaClient
from porla_tpu.protocol.server import PorlaServer
from porla_tpu.protocol.transport import InProcTransport

import pytest

# compile-heavy: nightly tier (see pyproject markers)
pytestmark = pytest.mark.slow


def test_checkpoint_restore_roundtrip():
    store = tempfile.mkdtemp(prefix="porla_ckpt_")
    cfg = PorlaConfig(scheme="ipa", storage_dir=store)
    server = PorlaServer(cfg)
    transport = InProcTransport(server)
    client = PorlaClient(cfg, transport, data_seed=bytes(range(16)))
    client.initialize(8)
    client.update(1)
    client.update(2)
    client.update(3)
    client.audit()

    server.save_checkpoint()

    # a brand-new process' server resumes from disk; same client goes on
    restored = PorlaServer.restore(cfg)
    transport.server = restored
    client.audit()
    client.update(4)
    client.audit()
