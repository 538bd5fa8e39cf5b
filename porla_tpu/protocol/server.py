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
        self._mesh = config.mesh
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
        self._mesh = self.config.mesh
        if self._mesh is not None:
            self._setup_sharded()

    def _setup_sharded(self) -> None:
        """Multi-chip mode: build the sharded CRebuild/commit/MSM kernels
        over the configured mesh (parallel/sharded.py). The data encode
        shards blocks over "blocks" with ppermute stage exchanges; the
        MAC mirror is a sharded point butterfly per stage; commitments
        are TP over "chunks"; audit combination MSMs are DP."""
        from jax.sharding import PartitionSpec as P

        from porla_tpu.parallel import sharded
        ctx, mesh = self.ctx, self._mesh
        self._stage = lambda a, spec=P("blocks"): sharded.stage(
            mesh, a, spec)
        self._sh_tab_p = [self._stage(t) for t in
                          sharded.stage_twiddle_tables(ctx, ctx.mod_p)]
        self._sh_tab_q = [self._stage(t) for t in
                          sharded.stage_twiddle_tables(ctx, ctx.mod_q)]
        self._sh_tab_std = [self._stage(t) for t in
                            sharded.stage_twiddle_tables_std(ctx)]
        self._sh_enc_p = sharded.sharded_encode_fn(ctx, mesh, ctx.mod_p)
        self._sh_enc_q = sharded.sharded_encode_fn(ctx, mesh, ctx.mod_q)
        self._sh_pt = sharded.sharded_point_stage_fn(ctx, mesh, self.ops)
        self._sh_commit = sharded.sharded_commit_fn(mesh, ops=self.ops)
        self._sh_msm32 = sharded.sharded_msm_fn(mesh, nbits=32,
                                                ops=self.ops)
        self._sh_pip_cache: dict = {}

    def _recv_blocks(self, msg: bytes) -> None:
        """Absorb one init batch: threaded batch block write + ONE MAC
        parse + in-place row assignment (the round-1 path rebuilt the full
        (n, 16) MAC arrays per block — O(n^2) copies at scale)."""
        rec = BLOCK_SIZE + points_io.MAC_WIRE_SIZE
        assert len(msg) % rec == 0
        count = len(msg) // rec
        view = memoryview(msg)
        datas = b"".join(view[k * rec:k * rec + BLOCK_SIZE]
                         for k in range(count))
        macs = b"".join(view[k * rec + BLOCK_SIZE:(k + 1) * rec]
                        for k in range(count))
        i0 = self._blocks_received
        self.store.write_blocks(range(i0, i0 + count), datas)
        pts = points_io.points_from_bytes(macs, ops=self.ops)
        self.mac_u.x[i0:i0 + count] = pts.x
        self.mac_u.y[i0:i0 + count] = pts.y
        self.mac_u.z[i0:i0 + count] = pts.z
        self._blocks_received += count

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
        """CRebuild (Server.hpp:1479-1485): rebuild level C from U.
        Cached (all-RAM) when the C level fits the caching budget,
        streamed out-of-core otherwise (CRebuild_No_Cached)."""
        with trace.span("server.crebuild", n=self.num_blocks):
            if self.height - 1 > self.config.top_caching_level:
                self._crebuild_streaming()
            else:
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
            if self._mesh is not None:
                st = self._stage
                dx = CrtArray(
                    self._sh_enc_p(st(data_x.p), *self._sh_tab_p),
                    self._sh_enc_q(st(data_x.q), *self._sh_tab_q))
                dy = CrtArray(
                    self._sh_enc_p(st(data_y.p), *self._sh_tab_p),
                    self._sh_enc_q(st(data_y.q), *self._sh_tab_q))
            else:
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

    def _crebuild_streaming(self) -> None:
        """CRebuild_No_Cached (Server.hpp:1835-2255): rebuild level C from
        U with the data plane streamed through staging files — RAM holds
        at most a stripe. MAC planes stay device/RAM-resident like the
        reference's (Server.hpp:221-241)."""
        from porla_tpu.protocol import stream
        n = self.num_blocks
        ctx = self.ctx
        top = self.height - 1
        S = self.config.stream_stripe_blocks
        wt = ctx.wt_scalar(self.write_step)
        tag_x, tag_y = "crx", "cry"

        stream.stage_u_to_staging(self.store, ctx, wt, n, tag_x, tag_y, S)
        for s in range(1, self.height):
            stream.stream_stage(self.store, ctx, tag_x, n, s, S)
            stream.stream_stage(self.store, ctx, tag_y, n, s, S)

        # MAC mirror: per-stage point butterflies (device-resident)
        wt_rep = np.broadcast_to(wt.std[0], (n, limbs.NLIMBS))
        cx = self.mac_u
        cy = compute.point_scale(self.mac_u, wt_rep, ops=self.ops)
        for s in range(1, self.height):
            cx = self._crebuild_mac_stage(s, cx)
            cy = self._crebuild_mac_stage(s, cy)
        pts = ck.fetch_many(list(cx) + list(cy))
        cx, cy = JacPoint(*pts[:3]), JacPoint(*pts[3:])

        ax = stream.finalize_staged_level(self, tag_x, True, top, n, S)
        ay = stream.finalize_staged_level(self, tag_y, False, top, n, S)

        top_lv = self.levels[top]
        top_lv.x = Planes(data=None, points={"c": cx, "a": ax})
        top_lv.y = Planes(data=None, points={"c": cy, "a": ay})
        top_lv.empty = False
        top_lv.file_backed = True
        for i in range(top):
            self.levels[i].x = Planes()
            self.levels[i].y = Planes()
            self.levels[i].empty = True
            self.levels[i].file_backed = False

    def _crebuild_mac_stage(self, s: int, macs: JacPoint) -> JacPoint:
        """One radix-2 stage over the (n,) MAC-commitment plane
        (device-resident; stages chain lazily). Sharded over the mesh's
        "blocks" axis in multi-chip mode."""
        with trace.span("server.crebuild.mac_stage", s=s):
            if self._mesh is not None:
                out = self._sh_pt[s](self._stage(macs.x),
                                     self._stage(macs.y),
                                     self._stage(macs.z),
                                     self._sh_tab_std[s - 1])
                return JacPoint(*out)
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
        self.mac_u.x[index - 1] = mac.x[0]
        self.mac_u.y[index - 1] = mac.y[0]
        self.mac_u.z[index - 1] = mac.z[0]

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
        if level > self.config.top_caching_level:
            self._fold_streamed(level, slot_x, slot_y)
        else:
            hlog.fold_to_level(ctx, self.levels, level, slot_x, slot_y)
        return level

    def _fold_streamed(self, target: int, slot_x: Planes,
                       slot_y: Planes) -> None:
        """Fold levels 0..target-1 + the incoming slot into file-backed
        level `target` with the data planes streamed stripewise through
        staging files (the reference's disk `mix`, Server.hpp:954-1207).
        Point (MAC) planes fold on device as usual."""
        from porla_tpu.protocol import stream
        ctx = self.ctx
        S = self.config.stream_stripe_blocks
        ram_limit = 1 << self.config.top_caching_level
        store = self.store

        def pts_only(p: Planes) -> Planes:
            return Planes(data=None, points=p.points)

        # point planes: same fold chain as hlog.fold_to_level
        st_px, st_py = hlog.mix_planes(
            ctx, pts_only(self.levels[0].x), pts_only(self.levels[0].y),
            pts_only(slot_x), pts_only(slot_y), 1)
        # data planes: RAM while the output fits the caching budget, then
        # staged files; `dx`/`dy` are CrtArray (RAM) or a staging tag
        dx, dy = slot_x.data, slot_y.data
        tag_cycle = 0
        for i in range(1, target + 1):
            length = 1 << (i - 1)        # upper/lower size of this mix
            lv = self.levels[i - 1]
            if i < target:
                st_px, st_py = hlog.mix_planes(
                    ctx, pts_only(self.levels[i].x),
                    pts_only(self.levels[i].y), st_px, st_py, 1 << i)
            # the point mix above consumed level i as lower; the DATA mix
            # below consumes level i-1 as lower of the length-sized step
            if 2 * length <= ram_limit:
                tw = ctx.twiddles(length)
                hix, lox = compute.data_butterfly(
                    ctx.mod_q, lv.x.data, dx, tw)
                hiy, loy = compute.data_butterfly(
                    ctx.mod_q, lv.y.data, dy, tw)
                dx = hlog.concat_crt(hix, lox)
                dy = hlog.concat_crt(hiy, loy)
            else:
                out_x = f"fx{tag_cycle ^ 1}"
                out_y = f"fy{tag_cycle ^ 1}"
                for is_x, d, planes, out_tag in (
                        (True, dx, lv.x, out_x), (False, dy, lv.y, out_y)):
                    if planes.data is not None:
                        lower = stream.ram_reader(planes.data)
                    else:
                        lower = stream.level_reader(store, self.mod_q,
                                                    is_x, i - 1)
                    if isinstance(d, CrtArray):
                        upper = stream.ram_reader(d)
                    else:
                        upper = stream.staged_reader(store, d)
                    stream.stream_mix(store, ctx, lower, upper, out_tag,
                                      length, S)
                    if not isinstance(d, CrtArray):
                        store.delete_staged(d, length)
                dx, dy = out_x, out_y
                tag_cycle ^= 1

        lvt = self.levels[target]
        lvt.x, lvt.y = hlog.materialize_planes2(st_px, st_py)
        n_out = 1 << target
        assert not isinstance(dx, CrtArray), "target level must be staged"
        ax = stream.finalize_staged_level(self, dx, True, target, n_out, S)
        ay = stream.finalize_staged_level(self, dy, False, target, n_out, S)
        ops = self.ops
        for planes, commits in ((lvt.x, ax), (lvt.y, ay)):
            planes.points["a"] = hlog.host_point(ck.add(
                ops, ck.to_device(planes.points["a"]),
                ck.to_device(commits)))
        lvt.empty = False
        lvt.file_backed = True
        for i in range(target):
            self.levels[i].x = Planes()
            self.levels[i].y = Planes()
            self.levels[i].empty = True
            self.levels[i].file_backed = False

    def _msm_sharded(self, pts: JacPoint, coeffs: list,
                     nbits: int = 32) -> JacPoint:
        """DP audit-combination MSM over the mesh (Server.hpp:831-848).
        Pads the point axis to a multiple of the "blocks" shard count
        with zero-scalar lanes (identity contributions). Large batches
        route through the per-shard Pallas Pippenger kernel (the
        windowed double-and-add path costs ~40x per point at scale);
        any nbits up to 256 is supported on that path."""
        from porla_tpu.parallel import sharded

        dp = self._mesh.shape["blocks"]
        n = pts.x.shape[0]
        npad = -(-n // dp) * dp
        sc = limbs.ints_to_limbs(list(coeffs) + [0] * (npad - n))
        if npad > n:
            pad = lambda a: np.concatenate(  # noqa: E731
                [np.asarray(a)] + [np.asarray(a)[:1]] * (npad - n), 0)
            pts = JacPoint(pad(pts.x), pad(pts.y), pad(pts.z))
        n_loc = npad // dp
        if (n_loc >= 4096 or nbits > 32
                or self.config.force_sharded_pippenger):
            key = (nbits, n_loc)
            if key not in self._sh_pip_cache:
                # at forced tiny sizes (the dryrun record / CI), shrink
                # the window width: the interpret-mode fold graph is
                # nwin*nb inlined point adds, and tracing/lowering it
                # dominates the multichip dryrun budget (c=2 -> 4x
                # fewer bodies than c=4); production sizes keep the
                # measured policy
                c = 2 if n_loc < 64 else None
                self._sh_pip_cache[key] = sharded.sharded_pippenger_msm_fn(
                    self._mesh, self.ops, nbits=nbits, n_local=n_loc, c=c)
            fn, finish = self._sh_pip_cache[key]
            out = finish(*fn(self._stage(pts.x), self._stage(pts.y),
                             self._stage(pts.z), self._stage(sc)))
            return JacPoint(out.x, out.y, out.z)
        assert nbits <= 32
        out = self._sh_msm32(self._stage(pts.x), self._stage(pts.y),
                             self._stage(pts.z), self._stage(sc))
        return JacPoint(out[0], out[1], out[2])  # (1, 16) components

    def _align(self, data: CrtArray, acc: JacPoint):
        """align_MAC (Server.hpp:478-562): acc += commit((A mod p) - A);
        A := A mod p. Returns (new acc (batch,), reduced data)."""
        c = compute_align_scalars(data, self.mod_q)
        commit = self._commit_batch(c)
        new_acc = hlog.host_point(
            ck.add(self.ops, ck.to_device(acc), commit))
        return new_acc, engine.crt_reduce_mod_p(np, data, self.mod_q)

    def _commit_batch(self, scalars) -> JacPoint:
        """Commit a (B, NUM_CHUNKS, 16) scalar batch: Pedersen MSM over the
        IPA generators, or the SRS MSM for KZG (compute_digest_from_srs,
        main.go:103-116)."""
        gens = (self.generators if self.config.scheme == "ipa"
                else self.srs.g1_dev)
        if self._mesh is not None:
            return self._commit_batch_sharded(gens, scalars)
        if self.config.scheme == "ipa":
            return pedersen.commit_blocks(gens, scalars)
        return pedersen.commit_blocks(gens, scalars, ops=self.ops)

    def _commit_batch_sharded(self, gens: JacPoint, scalars) -> JacPoint:
        """TP-over-chunks / DP-over-blocks commitment MSM (the multi-chip
        form of the 8-thread commitment splits, Server.hpp:330-361)."""
        from jax.sharding import PartitionSpec as P
        sc = np.asarray(scalars, np.uint32)
        B, ng = sc.shape[0], sc.shape[1]
        dp = self._mesh.shape["blocks"]
        Bp = -(-B // dp) * dp
        if Bp > B:
            sc = np.concatenate(
                [sc, np.zeros((Bp - B, ng, sc.shape[2]), np.uint32)], 0)
        stc = lambda a: self._stage(a, P("chunks"))  # noqa: E731
        out = self._sh_commit(stc(np.asarray(gens.x)[:ng]),
                              stc(np.asarray(gens.y)[:ng]),
                              stc(np.asarray(gens.z)[:ng]),
                              self._stage(sc, P("blocks", "chunks")))
        return JacPoint(out[0][:B], out[1][:B], out[2][:B])

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
            # one threaded batch read per file-backed (level, side) group
            # (the reference's 8-thread shuffled audit reads,
            # Server.hpp:742-776)
            groups: dict = {}
            for si, s in enumerate(plan.samples):
                lv = self.levels[s.level]
                planes = lv.x if s.is_x else lv.y
                if planes.data is None:
                    assert lv.file_backed, (
                        f"audited level {s.level} empty "
                        f"(write_step {self.write_step})")
                    groups.setdefault((s.level, s.is_x), []).append(
                        (si, s.index))
            file_rows: dict = {}
            for (level, is_x), items in groups.items():
                arr = self.store.read_codes_256(
                    is_x, level, [ix for _, ix in items])
                ql = engine.q_lane_from_p(np, arr, self.mod_q)
                for k, (si, _) in enumerate(items):
                    file_rows[si] = (arr[k], ql[k])
            for si, s in enumerate(plan.samples):
                lv = self.levels[s.level]
                planes = lv.x if s.is_x else lv.y
                if planes.data is not None:
                    blocks_p.append(np.asarray(planes.data.p)[s.index])
                    blocks_q.append(np.asarray(planes.data.q)[s.index])
                else:
                    rp, rq = file_rows[si]
                    blocks_p.append(rp)
                    blocks_q.append(rq)
                coeffs.append(s.coeff)
                for bag, name in ((ptc, "c"), (pta, "a")):
                    pts = planes.points[name]
                    bag.append((np.asarray(pts.x)[s.index],
                                np.asarray(pts.y)[s.index],
                                np.asarray(pts.z)[s.index]))

        # pad all audit batches to the occupancy-independent worst case
        # (auditing.audit_pad_slots) so every audit of this database size
        # reuses one set of executables: zero blocks with coefficient 0
        # and points at infinity are exact identity contributions
        S = auditing.audit_pad_slots(self.num_blocks, self.height)
        npad = S - len(coeffs)
        if npad:
            zb = np.zeros_like(blocks_p[0])
            blocks_p += [zb] * npad
            blocks_q += [zb] * npad
            coeffs += [0] * npad
            inf = hlog.infinity_points(1, self.ops)
            for bag in (ptc, pta):
                bag += [(inf.x[0], inf.y[0], inf.z[0])] * npad

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
            from porla_tpu.curves import pallas_curve
            if self._mesh is not None:
                combined_mac_j = self._msm_sharded(stack_pts(ptc), coeffs)
                combined_align_j = self._msm_sharded(stack_pts(pta), coeffs)
            elif pallas_curve.use_pallas():
                both = hlog.concat_points(stack_pts(ptc), stack_pts(pta))
                parts = pallas_curve.scalar_mul(
                    ops, both, coeff_limbs, nbits=32, keep_pad=True)
                half = len(coeffs)
                combined_mac_j = ck.tree_sum(ops, ck.index(
                    parts, slice(0, half)))
                combined_align_j = ck.tree_sum(ops, ck.index(
                    parts, slice(half, 2 * half)))
            else:
                both = hlog.concat_points(stack_pts(ptc), stack_pts(pta))
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


