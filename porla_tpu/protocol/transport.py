"""Client<->server transport.

The reference uses ZeroMQ REQ/REP over tcp://localhost:8888 with strictly
alternating request/reply (Client.hpp:108-112, Server.hpp:113-115). That
is control-plane traffic, so we keep the same shape: an in-process
transport for tests/benchmarks and a ZMQ REQ/REP pair for real two-process
deployments.
"""

from __future__ import annotations

from porla_tpu.utils import trace


class InProcTransport:
    """Directly couples a client to a server instance (single process)."""

    def __init__(self, server):
        self.server = server

    def __call__(self, msg: bytes) -> bytes:
        trace.count("transport.round_trips")
        trace.count("transport.bytes_sent", len(msg))
        reply = self.server.handle(bytes(msg))
        trace.count("transport.bytes_received", len(reply))
        return reply


class ZmqClientTransport:
    def __init__(self, endpoint: str = "tcp://localhost:8888"):
        import zmq
        self._ctx = zmq.Context.instance()
        self.sock = self._ctx.socket(zmq.REQ)
        self.sock.connect(endpoint)

    def __call__(self, msg: bytes) -> bytes:
        trace.count("transport.round_trips")
        trace.count("transport.bytes_sent", len(msg))
        self.sock.send(msg)
        reply = self.sock.recv()
        trace.count("transport.bytes_received", len(reply))
        return reply


def serve_zmq(server, bind: str = "tcp://*:8888", forever: bool = True):
    """REQ/REP dispatch loop (the reference's Server::self_test,
    Server.hpp:933-952)."""
    import zmq
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.REP)
    sock.bind(bind)
    while True:
        msg = sock.recv()
        sock.send(server.handle(msg))
        if not forever and server._state == "ready":
            # used by tests to stop after initialization
            break
    return sock
