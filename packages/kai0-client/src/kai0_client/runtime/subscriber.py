"""Subscriber ABC: episode lifecycle observers (parity: openpi_client/runtime/subscriber.py)."""

import abc


class Subscriber(abc.ABC):
    """Receives episode lifecycle callbacks (e.g. data recorders, visualizers)."""

    def on_episode_start(self) -> None: ...

    def on_step(self, observation: dict, action: dict) -> None: ...

    def on_episode_end(self) -> None: ...
