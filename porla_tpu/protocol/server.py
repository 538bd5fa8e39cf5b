"""Porla server: stores the database, maintains the hierarchical log with
homomorphic MACs, answers updates and audits.

Reimplements the reference server's semantics (porla/Server/Server.hpp) on
the TPU compute stack: data plane = CRT limb tensors, MAC plane = batched
Jacobian point kernels. Message framing mirrors the reference's
REQ/REP flow (opcodes 'U'/'A', Server.hpp:933-952); MAC wire format is
this framework's 96-byte Jacobian triple (protocol/points_io.py), and
audit replies keep the reference's 33-byte compressed points + IPA proof
layout (Server.hpp:880-894).
"""

from __future__ import annotations

import numpy as np

from porla_tpu.config import BLOCK_SIZE, NUM_CHUNKS, PorlaConfig
from porla_tpu.commit import ipa, pedersen
from porla_tpu.curves import kernels as ck
from porla_tpu.curves.instances import secp256k1
from porla_tpu.curves.weierstrass import JacPoint
from porla_tpu.fields import limbs
from porla_tpu.golden import ecc
from porla_tpu.ntt import engine
from porla_tpu.ntt.engine import CrtArray, NttContext
from porla_tpu.protocol import auditing, compute, hlog, points_io
from porla_tpu.protocol.hlog import Level, Planes
from porla_tpu.storage.store import BlockStore
from porla_tpu.utils import trace


class PorlaServer:
    def __init__(self, config: PorlaConfig):
        self.config = config
        self.store = BlockStore(config.storage_dir)
        if config.scheme == "ipa":
            (self.generators, self.u,
             self._gens_affine) = pedersen.ipa_generators()
            self.ops = secp256k1()
        else:  # kzg: SRS arrives from the client (Server.hpp:179-194)
            from porla_tpu.curves.instances import bn254
            self.srs = None
            self.ops = bn254()
        self.num_blocks = 0
        self.write_step = 0
        self._state = "generators"

    # ------------------------------------------------------------------ wire

    def handle(self, msg: bytes) -> bytes:
        if self._state == "generators":
            self._state = "num_blocks"
            if self.config.scheme == "ipa":
                assert msg == b"GET GENERATORS"
                pts = self._gens_affine + [self.u]
                return points_io.points_to_bytes(
                    self.ops.from_affine(np, pts))
            # kzg: first message is the SRS (init_SRS_from_data,
            # Server.hpp:179-194)
            from porla_tpu.commit import kzg
            self.srs = kzg.KzgSrs.from_bytes(msg)
            return b"RECEIVED SRS FROM CLIENT."
        if self._state == "num_blocks":
            self._setup(int.from_bytes(msg[:4], "little"))
            self._state = "blocks"
            return b"OK: awaiting blocks"
        if self._state == "blocks":
            self._recv_blocks(msg)
            if self._blocks_received == self.num_blocks:
                self._state = "deltas"
            return f"RECEIVED {len(msg)} BYTES FROM CLIENT.".encode()
        if self._state == "deltas":
            reply = f"RECEIVED {len(msg)} BYTES FROM CLIENT.".encode()
            self._crebuild()
            self._absorb_deltas(self.height - 1, msg)
            self._state = "ready"
            return reply
        op = msg[:1]
        if op == b"U":
            return self.update(msg[1:])
        if op == b"A":
            return self.audit(msg[1:17])
        raise ValueError(f"unknown opcode {op!r}")

    # ----------------------------------------------------------------- setup

    def _setup(self, num_blocks: int) -> None:
        self.num_blocks = num_blocks
        self.ctx = NttContext(num_blocks, self.config.scheme)
        self.height = self.ctx.height
        self.mod_q = self.ctx.mod_q
        self.write_step = 0
        self.levels = [Level(Planes(), Planes()) for _ in range(self.height)]
        self.mac_u = hlog.infinity_points(num_blocks, self.ops)
        self._blocks_received = 0

    def _recv_blocks(self, msg: bytes) -> None:
        rec = BLOCK_SIZE + points_io.MAC_WIRE_SIZE
        assert len(msg) % rec == 0
        count = len(msg) // rec
        for k in range(count):
            data = msg[k * rec:k * rec + BLOCK_SIZE]
            mac = msg[k * rec + BLOCK_SIZE:(k + 1) * rec]
            i = self._blocks_received
            self.store.write_block(i, data)
            pt = points_io.points_from_bytes(mac, ops=self.ops)
            self.mac_u = hlog.host_point(JacPoint(
                _set_row(self.mac_u.x, i, pt.x[0]),
                _set_row(self.mac_u.y, i, pt.y[0]),
                _set_row(self.mac_u.z, i, pt.z[0])))
            self._blocks_received += 1

    def _absorb_deltas(self, level: int, msg: bytes) -> None:
        """Add complement deltas into MAC_commitments_H[level]
        (Server.hpp:289-307, 449-469)."""
        deltas = points_io.points_from_bytes(msg, ops=self.ops)
        l = 1 << level
        assert deltas.x.shape[0] == 2 * l
        lv = self.levels[level]
        dx = JacPoint(deltas.x[:l], deltas.y[:l], deltas.z[:l])
        dy = JacPoint(deltas.x[l:], deltas.y[l:], deltas.z[l:])
        ops = self.ops
        lv.x.points["c"] = hlog.host_point(
            ck.add(ops, ck.to_device(lv.x.points["c"]), ck.to_device(dx)))
        lv.y.points["c"] = hlog.host_point(
            ck.add(ops, ck.to_device(lv.y.points["c"]), ck.to_device(dy)))

    # --------------------------------------------------- checkpoint/resume

    def save_checkpoint(self) -> str:
        """Persist the full server state (write counter, MAC planes, RAM
        levels) alongside the U/H_X/H_Y trees so a server can resume
        in-place. The reference ships (unused) helpers for this
        (write_database_to_file / write_MAC_to_file, utils.h:212-232,
        400-471) but has no resume path in main; here it is first-class.
        Returns the checkpoint path."""
        import json
        import os
        assert self._state == "ready", "checkpoint only from ready state"
        arrays: dict = {}
        meta = {"scheme": self.config.scheme,
                "num_blocks": self.num_blocks,
                "write_step": self.write_step,
                "levels": []}
        for li, lv in enumerate(self.levels):
            lm = {"empty": lv.empty, "file_backed": lv.file_backed,
                  "sides": {}}
            for side, planes in (("x", lv.x), ("y", lv.y)):
                pm = {"has_data": planes.data is not None,
                      "points": planes.point_names()}
                if planes.data is not None:
                    arrays[f"L{li}{side}_dp"] = np.asarray(planes.data.p)
                    arrays[f"L{li}{side}_dq"] = np.asarray(planes.data.q)
                for nm in planes.point_names():
                    pt = planes.points[nm]
                    for c, a in zip("xyz", pt):
                        arrays[f"L{li}{side}_{nm}{c}"] = np.asarray(a)
                lm["sides"][side] = pm
            meta["levels"].append(lm)
        for c, a in zip("xyz", self.mac_u):
            arrays[f"mac_u_{c}"] = np.asarray(a)
        if self.config.scheme == "kzg":
            arrays["srs"] = np.frombuffer(self.srs.to_bytes(), np.uint8)
        path = os.path.join(self.store.root, "checkpoint.npz")
        np.savez(path, **arrays)
        with open(os.path.join(self.store.root, "checkpoint.json"),
                  "w") as f:
            json.dump(meta, f)
        return path

    @classmethod
    def restore(cls, config: PorlaConfig) -> "PorlaServer":
        """Resume a server from save_checkpoint state in
        config.storage_dir (U/H_X/H_Y files are used in place)."""
        import json
        import os
        srv = cls(config)
        with open(os.path.join(config.storage_dir,
                               "checkpoint.json")) as f:
            meta = json.load(f)
        data = np.load(os.path.join(config.storage_dir, "checkpoint.npz"))
        assert meta["scheme"] == config.scheme
        if config.scheme == "kzg":
            from porla_tpu.commit import kzg
            srv.srs = kzg.KzgSrs.from_bytes(data["srs"].tobytes())
        srv._setup(meta["num_blocks"])
        srv.write_step = meta["write_step"]
        srv.mac_u = JacPoint(data["mac_u_x"], data["mac_u_y"],
                             data["mac_u_z"])
        for li, lm in enumerate(meta["levels"]):
            lv = srv.levels[li]
            lv.empty = lm["empty"]
            lv.file_backed = lm["file_backed"]
            for side in ("x", "y"):
                pm = lm["sides"][side]
                planes = Planes()
                if pm["has_data"]:
                    planes.data = CrtArray(data[f"L{li}{side}_dp"],
                                           data[f"L{li}{side}_dq"])
                for nm in pm["points"]:
                    planes.points[nm] = JacPoint(
                        data[f"L{li}{side}_{nm}x"],
                        data[f"L{li}{side}_{nm}y"],
                        data[f"L{li}{side}_{nm}z"])
                setattr(lv, side, planes)
        srv._state = "ready"
        return srv

    # ------------------------------------------------------------- rebuild

    def _crebuild(self) -> None:
        """CRebuild_Cached (Server.hpp:1487-1833): rebuild level C from U."""
        with trace.span("server.crebuild", n=self.num_blocks):
            self._crebuild_impl()

    def _crebuild_impl(self) -> None:
        n = self.num_blocks
        ctx = self.ctx
        wt = ctx.wt_scalar(self.write_step)

        data_x = self.store.read_blocks_crt(range(n), self.mod_q)
        data_y = compute.scale_crt(self.mod_q, data_x, wt)

        mc_x = self.mac_u
        wt_rep = np.broadcast_to(wt.std[0], (n, limbs.NLIMBS))
        mc_y = compute.point_scale(self.mac_u, wt_rep, ops=self.ops)

        # data planes: all butterfly stages in one fused encode (the
        # constant-geometry Pallas pipeline on TPU); MAC-commitment
        # planes: per-stage point butterflies. Alignments are reset to
        # infinity (no align_MAC in the cached path).
        with trace.span("server.crebuild.data"):
            dx = compute.encode_crt(self.mod_q, ctx, data_x)
            dy = compute.encode_crt(self.mod_q, ctx, data_y)
        cx, cy = mc_x, mc_y
        for s in range(1, self.height):
            cx = self._crebuild_mac_stage(s, cx)
            cy = self._crebuild_mac_stage(s, cy)
        (dxp, dxq, dyp, dyq, *pts) = ck.fetch_many(
            [dx.p, dx.q, dy.p, dy.q] + list(cx) + list(cy))
        dx, dy = CrtArray(dxp, dxq), CrtArray(dyp, dyq)
        cx, cy = JacPoint(*pts[:3]), JacPoint(*pts[3:])

        top = self.levels[self.height - 1]
        top.x = Planes(data=dx,
                       points={"c": cx, "a": hlog.infinity_points(n, self.ops)})
        top.y = Planes(data=dy,
                       points={"c": cy, "a": hlog.infinity_points(n, self.ops)})
        top.empty = False
        top.file_backed = False
        for i in range(self.height - 1):
            self.levels[i].x = Planes()
            self.levels[i].y = Planes()
            self.levels[i].empty = True
            self.levels[i].file_backed = False
        self._spill_level(self.height - 1)

    def _crebuild_mac_stage(self, s: int, macs: JacPoint) -> JacPoint:
        """One radix-2 stage over the (n,) MAC-commitment plane
        (device-resident; stages chain lazily)."""
        with trace.span("server.crebuild.mac_stage", s=s):
            return compute.point_stage(self.ctx, s, macs, ops=self.ops)

    # --------------------------------------------------------------- update

    def update(self, payload: bytes) -> bytes:
        with trace.span("server.update", write_step=self.write_step + 1):
            return self._update_impl(payload)

    def _update_impl(self, payload: bytes) -> bytes:
        index = int.from_bytes(payload[:8], "little")
        data = payload[:BLOCK_SIZE]
        self.store.write_block(index - 1, data)
        chunks = [int.from_bytes(data[i * 32:(i + 1) * 32], "little")
                  for i in range(NUM_CHUNKS)]

        mac = points_io.points_from_bytes(
            payload[BLOCK_SIZE:BLOCK_SIZE + points_io.MAC_WIRE_SIZE],
            ops=self.ops)
        self.mac_u = hlog.host_point(JacPoint(
            _set_row(self.mac_u.x, index - 1, mac.x[0]),
            _set_row(self.mac_u.y, index - 1, mac.y[0]),
            _set_row(self.mac_u.z, index - 1, mac.z[0])))

        self.write_step += 1
        if self.write_step % self.num_blocks == 0:
            self._crebuild()
            updated_level = self.height - 1
        else:
            updated_level = self._hadd(chunks, mac)

        self._absorb_deltas(
            updated_level, payload[BLOCK_SIZE + points_io.MAC_WIRE_SIZE:])
        return f"BLOCK {index} IS UPDATED.".encode()

    def _hadd(self, chunks: list[int], mac: JacPoint) -> int:
        """HAdd (Server.hpp:1388-1477). Returns the folded level."""
        with trace.span("server.hadd"):
            return self._hadd_impl(chunks, mac)

    def _hadd_impl(self, chunks: list[int], mac: JacPoint) -> int:
        ctx = self.ctx
        wt = ctx.wt_scalar(self.write_step)
        data = engine.crt_from_ints(chunks, self.mod_q)
        data = CrtArray(data.p[None], data.q[None])  # (1, C, 16)

        data_b2 = hlog.host_crt(compute.scale_crt(self.mod_q, data, wt))
        mac_b2 = hlog.host_point(compute.point_scale(mac, wt.std,
                                                     ops=self.ops))

        # align_MAC(data_B2): commit the mod-p correction, reduce data
        align_b2, data_b2 = self._align(
            data_b2, hlog.infinity_points(1, self.ops))
        align_x = hlog.infinity_points(1, self.ops)

        slot_x = Planes(data=data, points={"c": mac, "a": align_x})
        slot_y = Planes(data=data_b2, points={"c": mac_b2, "a": align_b2})

        if self.levels[0].empty:
            self.levels[0].x = slot_x
            self.levels[0].y = slot_y
            self.levels[0].empty = False
            return 0
        level = 1
        while not self.levels[level].empty:
            level += 1
        for i in range(level):
            self._materialize_level(i)
        hlog.fold_to_level(ctx, self.levels, level, slot_x, slot_y)
        self._spill_level(level)
        return level

    # ---------------------------------------------------- disk tier (H_X/H_Y)

    def _spill_level(self, level: int) -> None:
        """Beyond TOP_CACHING_LEVEL a level's data lives on disk as
        mod-p-reduced 256-bit codeword files, with the reduction committed
        into the alignment MACs — the TPU-native reshaping of the
        reference's disk tier (CRebuild_No_Cached final stage and disk
        `mix`, Server.hpp:1835-2255, :954-1207: per-butterfly file RMW
        becomes stage-streamed compute + one aligned batched spill)."""
        if level <= self.config.top_caching_level:
            return
        trace.count("server.spill_level")
        lv = self.levels[level]
        ops = self.ops
        for is_x, planes in ((True, lv.x), (False, lv.y)):
            data = planes.data
            if data is None:
                continue
            n = data.p.shape[0]
            c = compute_align_scalars(data, self.mod_q)
            commits = self._commit_batch(c)
            planes.points["a"] = hlog.host_point(ck.add(
                ops, ck.to_device(planes.points["a"]), commits))
            reduced = engine.crt_reduce_mod_p(np, hlog.host_crt(data))
            vals = limbs.limbs_to_ints(
                np.asarray(reduced.p).reshape(-1, limbs.NLIMBS))
            for i in range(n):
                self.store.write_code_256(
                    is_x, level, i,
                    vals[i * NUM_CHUNKS:(i + 1) * NUM_CHUNKS])
            planes.data = None
        lv.file_backed = True

    def _materialize_level(self, level: int) -> None:
        """Load a file-backed level's data planes back into memory."""
        lv = self.levels[level]
        if not lv.file_backed or lv.empty:
            return
        for is_x, planes in ((True, lv.x), (False, lv.y)):
            n = planes.points["c"].x.shape[0]
            vals = []
            for i in range(n):
                vals.extend(self.store.read_code_256(is_x, level, i))
            arr = limbs.ints_to_limbs(vals)
            arr = arr.reshape(n, NUM_CHUNKS, limbs.NLIMBS)
            planes.data = CrtArray(arr, arr)  # values < p: both lanes equal
        lv.file_backed = False

    def _read_file_block(self, level: int, is_x: bool, index: int) -> CrtArray:
        vals = self.store.read_code_256(is_x, level, index)
        arr = limbs.ints_to_limbs(vals)
        return CrtArray(arr, arr)

    def _align(self, data: CrtArray, acc: JacPoint):
        """align_MAC (Server.hpp:478-562): acc += commit((A mod p) - A);
        A := A mod p. Returns (new acc (batch,), reduced data)."""
        c = compute_align_scalars(data, self.mod_q)
        commit = self._commit_batch(c)
        new_acc = hlog.host_point(
            ck.add(self.ops, ck.to_device(acc), commit))
        return new_acc, engine.crt_reduce_mod_p(np, data)

    def _commit_batch(self, scalars) -> JacPoint:
        """Commit a (B, NUM_CHUNKS, 16) scalar batch: Pedersen MSM over the
        IPA generators, or the SRS MSM for KZG (compute_digest_from_srs,
        main.go:103-116)."""
        if self.config.scheme == "ipa":
            return pedersen.commit_blocks(self.generators, scalars)
        return pedersen.commit_blocks(self.srs.g1_dev, scalars,
                                      ops=self.ops)

    # ---------------------------------------------------------------- audit

    def audit(self, seed: bytes) -> bytes:
        with trace.span("server.audit", write_step=self.write_step):
            return self._audit_impl(seed)

    def _audit_impl(self, seed: bytes) -> bytes:
        plan = auditing.build_audit_plan(
            seed, self.write_step, self.num_blocks, self.height)

        blocks_p, blocks_q, coeffs = [], [], []
        ptc, pta = [], []
        with trace.span("server.audit.gather", samples=len(plan.samples)):
            for s in plan.samples:
                lv = self.levels[s.level]
                planes = lv.x if s.is_x else lv.y
                if planes.data is not None:
                    blocks_p.append(np.asarray(planes.data.p)[s.index])
                    blocks_q.append(np.asarray(planes.data.q)[s.index])
                else:
                    assert lv.file_backed, (
                        f"audited level {s.level} empty "
                        f"(write_step {self.write_step})")
                    arr = self._read_file_block(s.level, s.is_x, s.index)
                    blocks_p.append(arr.p)
                    blocks_q.append(arr.q)
                coeffs.append(s.coeff)
                for bag, name in ((ptc, "c"), (pta, "a")):
                    pts = planes.points[name]
                    bag.append((np.asarray(pts.x)[s.index],
                                np.asarray(pts.y)[s.index],
                                np.asarray(pts.z)[s.index]))

        blocks = CrtArray(np.stack(blocks_p), np.stack(blocks_q))
        with trace.span("server.audit.combine"):
            B = hlog.host_crt(
                compute.linear_combine_crt(self.mod_q, blocks, coeffs))

        def stack_pts(bag):
            return JacPoint(np.stack([b[0] for b in bag]),
                            np.stack([b[1] for b in bag]),
                            np.stack([b[2] for b in bag]))

        coeff_limbs = limbs.ints_to_limbs(coeffs + coeffs)
        ops = self.ops
        with trace.span("server.audit.msm", n=len(coeffs)):
            # MAC + alignment MSMs share coefficients -> one kernel call
            # over the stacked point set, reduced per half
            both = hlog.concat_points(stack_pts(ptc), stack_pts(pta))
            from porla_tpu.curves import pallas_curve
            if pallas_curve.use_pallas():
                parts = pallas_curve.scalar_mul(
                    ops, both, coeff_limbs, nbits=32, keep_pad=True)
                half = len(coeffs)
                combined_mac_j = ck.tree_sum(ops, ck.index(
                    parts, slice(0, half)))
                combined_align_j = ck.tree_sum(ops, ck.index(
                    parts, slice(half, 2 * half)))
            else:
                half = len(coeffs)
                combined_mac_j = ck.msm(
                    ops, ck.index(both, slice(0, half)),
                    coeff_limbs[:half], nbits=32)
                combined_align_j = ck.msm(
                    ops, ck.index(both, slice(half, 2 * half)),
                    coeff_limbs[half:], nbits=32)

        # align_MAC(B, combined_align); commitment over the reduced B
        B1 = CrtArray(B.p[None], B.q[None])
        combined_align_b, B1 = self._align(
            B1, hlog.host_point(ck.to_host(combined_align_j)))

        b_chunks = limbs.limbs_to_ints(np.asarray(B1.p[0]))

        if self.config.scheme == "ipa":
            combined_mac = ops.to_affine(ck.to_host(combined_mac_j))[0]
            combined_align = ops.to_affine(combined_align_b)[0]
            commitment = ops.to_affine(ck.to_host(pedersen.commit_blocks(
                self.generators, limbs.ints_to_limbs(b_chunks)[None])))[0]

            # IPA proof over (B, challenge powers) (Server.hpp:856-877)
            a_vec = list(b_chunks)
            b_vec = []
            v = plan.ipa_challenge  # signed int32, may be negative
            for _ in range(NUM_CHUNKS):
                b_vec.append(v)
                v = (v * v) % self.mod_q.n
            with trace.span("server.audit.prove"):
                proof = ipa.prove(a_vec, b_vec, self.generators, self.u)
            return (ecc.secp_serialize_compressed(commitment)
                    + ecc.secp_serialize_compressed(combined_mac)
                    + ecc.secp_serialize_compressed(combined_align)
                    + proof)

        # kzg: proof = [commitment(64) | H(64) | point(32) | claimed(32)]
        # followed by the two combined points (create_kzg_proof,
        # Server.hpp:898-916 / main.go:153-175)
        from porla_tpu.commit import kzg
        commitment = kzg.commit_msm(self.srs, b_chunks)
        # the reference passes the next unconsumed signed int through a C
        # int -> Go uint64 conversion (negative wraps mod 2^64)
        z = plan.kzg_challenge & 0xFFFFFFFFFFFFFFFF if plan.kzg_challenge < 0 \
            else plan.kzg_challenge
        H, claimed = kzg.open_at(self.srs, b_chunks, z)
        proof = (ecc.bn254_marshal(commitment) + ecc.bn254_marshal(H)
                 + (z % kzg.FR).to_bytes(32, "big")
                 + claimed.to_bytes(32, "big"))
        return (proof
                + points_io.points_to_bytes(
                    hlog.host_point(ck.to_host(combined_mac_j)), ops)
                + points_io.points_to_bytes(combined_align_b, ops))


def compute_align_scalars(data: CrtArray, mod_q) -> np.ndarray:
    """(batch, C, 16) q-lane correction scalars for align_MAC."""
    return np.asarray(engine.align_scalars(np, hlog.host_crt(data), mod_q))


def _set_row(arr, i: int, row) -> np.ndarray:
    out = np.asarray(arr).copy()
    out[i] = np.asarray(row)
    return out
