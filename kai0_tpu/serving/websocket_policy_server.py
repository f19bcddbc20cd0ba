"""Websocket action-chunk policy server.

Wire protocol (parity: reference ``src/openpi/serving/websocket_policy_server.py``
— the protocol is the contract, the code is not): on connect the server sends one
msgpack metadata frame; each received msgpack observation is answered with one
msgpack action frame whose ``server_timing`` dict carries ``infer_ms`` and, from
the second reply on, ``prev_total_ms`` (the previous full recv→send round-trip —
only a *finished* iteration can include its own send time). On an unexpected
error the traceback is sent as a text frame and the socket closes with
INTERNAL_ERROR. ``GET /healthz`` answers 200 for load-balancer probes.

TPU-native notes: inference runs on a worker thread, never on the event loop —
a first-call XLA compile can take minutes and must not starve keepalive pings;
callers should warm the policy before the listener starts (scripts/serve_policy.py
``--warmup``) so the first request is served at steady-state latency.
"""

from __future__ import annotations

import asyncio
import dataclasses
import http
import logging
import time
import traceback

import websockets.asyncio.server
import websockets.exceptions
import websockets.frames

from kai0_client import msgpack_numpy

logger = logging.getLogger("kai0_tpu")

_CLOSE_ON_ERROR = (
    websockets.frames.CloseCode.INTERNAL_ERROR,
    "Internal server error. Traceback included in previous frame.",
)


@dataclasses.dataclass
class _Session:
    """One client connection: greet, then answer observations forever."""

    socket: websockets.asyncio.server.ServerConnection
    policy: object
    metadata: dict
    _pack: msgpack_numpy.Packer = dataclasses.field(default_factory=msgpack_numpy.Packer)
    _last_roundtrip_s: float | None = None

    async def greet(self) -> None:
        await self.socket.send(self._pack.pack(self.metadata))

    async def answer_one(self) -> None:
        t_recv = time.monotonic()
        request = msgpack_numpy.unpackb(await self.socket.recv())

        loop = asyncio.get_running_loop()
        t_infer = time.monotonic()
        reply = await loop.run_in_executor(None, self.policy.infer, request)
        # The policy's own breakdown rides along, with its model-call time
        # renamed to model_ms so it survives next to infer_ms — which stays the
        # server-observed wall time of the whole policy call, matching the
        # reference's semantics (websocket_policy_server.py:64-69).
        timing = dict(reply.pop("policy_timing", {}))
        if "infer_ms" in timing:
            timing["model_ms"] = timing.pop("infer_ms")
        timing["infer_ms"] = (time.monotonic() - t_infer) * 1000

        if self._last_roundtrip_s is not None:
            timing["prev_total_ms"] = self._last_roundtrip_s * 1000
        reply["server_timing"] = timing

        await self.socket.send(self._pack.pack(reply))
        self._last_roundtrip_s = time.monotonic() - t_recv


async def _run_session(session: _Session) -> None:
    peer = session.socket.remote_address
    logger.info(f"Connection from {peer} opened")
    try:
        await session.greet()
        while True:
            await session.answer_one()
    except websockets.exceptions.ConnectionClosed:
        logger.info(f"Connection from {peer} closed")
    except Exception:
        # Contract: ship the traceback to the client, then close abnormally.
        await session.socket.send(traceback.format_exc())
        await session.socket.close(*_CLOSE_ON_ERROR)
        raise


def _respond_to_probe(connection, request):
    if request.path == "/healthz":
        return connection.respond(http.HTTPStatus.OK, "OK\n")
    return None  # fall through to the websocket handshake


class WebsocketPolicyServer:
    """Serve ``policy.infer`` over the msgpack/websocket action-chunk protocol."""

    def __init__(
        self,
        policy,
        host: str = "0.0.0.0",
        port: int | None = None,
        metadata: dict | None = None,
    ) -> None:
        self._policy = policy
        self._host = host
        self._port = port
        self._metadata = metadata or {}
        logging.getLogger("websockets.server").setLevel(logging.INFO)

    def serve_forever(self) -> None:
        asyncio.run(self.run())

    async def run(self) -> None:
        async def handler(socket):
            await _run_session(_Session(socket, self._policy, self._metadata))

        listener = websockets.asyncio.server.serve(
            handler,
            self._host,
            self._port,
            compression=None,  # images are already jpeg/raw uint8; zlib only adds latency
            max_size=None,
            process_request=_respond_to_probe,
        )
        async with listener as server:
            await server.serve_forever()
