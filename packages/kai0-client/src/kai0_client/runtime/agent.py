"""Agent ABC for the client runtime loop (parity: openpi_client/runtime/agent.py)."""

import abc


class Agent(abc.ABC):
    @abc.abstractmethod
    def get_action(self, observation: dict) -> dict:
        """Map an observation to an action."""

    def reset(self) -> None:
        """Reset any internal state at episode boundaries."""
