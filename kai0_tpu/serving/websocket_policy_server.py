"""Websocket action-chunk policy server.

Wire protocol (parity: reference ``src/openpi/serving/websocket_policy_server.py``):
on connect the server sends one msgpack metadata frame; then each received msgpack
observation is answered with a msgpack action frame carrying
``server_timing.infer_ms`` (and ``prev_total_ms`` covering the previous full
round-trip including send). Unexpected errors send the traceback as a text frame and
close with INTERNAL_ERROR. ``GET /healthz`` answers 200.

TPU-native addition: the policy can be warmed up (pre-jitted) before the listener
starts, so the first client request is served at steady-state latency instead of
paying the XLA compile (multi-minute on the 3B model).
"""

from __future__ import annotations

import asyncio
import http
import logging
import time
import traceback

import websockets.asyncio.server as _server
import websockets.frames

from kai0_client import msgpack_numpy

logger = logging.getLogger("kai0_tpu")


class WebsocketPolicyServer:
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

    async def run(self):
        async with _server.serve(
            self._handler,
            self._host,
            self._port,
            compression=None,
            max_size=None,
            process_request=_health_check,
        ) as server:
            await server.serve_forever()

    async def _handler(self, websocket: _server.ServerConnection):
        logger.info(f"Connection from {websocket.remote_address} opened")
        packer = msgpack_numpy.Packer()

        await websocket.send(packer.pack(self._metadata))

        prev_total_time = None
        while True:
            try:
                start_time = time.monotonic()
                obs = msgpack_numpy.unpackb(await websocket.recv())

                infer_time = time.monotonic()
                # Run inference off the event loop: a long infer (first-call XLA
                # compile can take minutes) must not block keepalive pings.
                action = await asyncio.get_running_loop().run_in_executor(
                    None, self._policy.infer, obs
                )
                infer_time = time.monotonic() - infer_time

                action["server_timing"] = {"infer_ms": infer_time * 1000}
                if prev_total_time is not None:
                    # Only the previous round-trip can include its send time.
                    action["server_timing"]["prev_total_ms"] = prev_total_time * 1000

                await websocket.send(packer.pack(action))
                prev_total_time = time.monotonic() - start_time
            except websockets.ConnectionClosed:
                logger.info(f"Connection from {websocket.remote_address} closed")
                break
            except Exception:
                await websocket.send(traceback.format_exc())
                await websocket.close(
                    code=websockets.frames.CloseCode.INTERNAL_ERROR,
                    reason="Internal server error. Traceback included in previous frame.",
                )
                raise


def _health_check(connection: _server.ServerConnection, request: _server.Request) -> _server.Response | None:
    if request.path == "/healthz":
        return connection.respond(http.HTTPStatus.OK, "OK\n")
    return None
