"""Disk tier: levels beyond top_caching_level spill to H_X/H_Y files
(mod-p-reduced, alignment-committed) and audits read them back."""

import os

import pytest

from porla_tpu.config import PorlaConfig
from porla_tpu.protocol.client import PorlaClient
from porla_tpu.protocol.server import PorlaServer
from porla_tpu.protocol.transport import InProcTransport

# compile-heavy: nightly tier (see pyproject markers)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module", params=["ipa", "kzg"])
def pair(request, tmp_path_factory):
    # kzg exercises the q-lane re-canonicalization on materialize/spill
    # (BN254_R < p; advisor r1 high finding)
    cfg = PorlaConfig(scheme=request.param, top_caching_level=1,
                      storage_dir=str(tmp_path_factory.mktemp("store")))
    server = PorlaServer(cfg)
    client = PorlaClient(cfg, InProcTransport(server),
                         data_seed=bytes([7] * 16))
    client.initialize(8)
    return client, server


def test_top_level_is_file_backed(pair):
    client, server = pair
    top = server.levels[server.height - 1]
    assert top.file_backed and top.x.data is None
    # codeword files exist in the reference's layout: H_X/<level>_<i>
    path = os.path.join(server.config.storage_dir, "H_X",
                        f"{server.height - 1}_0")
    assert os.path.exists(path) and os.path.getsize(path) == 4096


def test_audit_reads_files(pair):
    client, server = pair
    client.audit(seed=bytes([1] * 16))


def test_updates_fold_through_disk_levels(pair):
    client, server = pair
    # enough writes to occupy level 2 (> top_caching_level=1) and fold
    # through materialize/spill paths
    for i in range(4):
        client.update(i + 1)
    assert server.levels[2].file_backed
    client.audit()
