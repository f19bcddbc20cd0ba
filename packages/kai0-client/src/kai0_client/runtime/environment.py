"""Environment ABC for the client runtime loop (parity: openpi_client/runtime/environment.py)."""

import abc


class Environment(abc.ABC):
    """An environment the agent interacts with (robot hardware or simulator)."""

    @abc.abstractmethod
    def reset(self) -> None:
        """Reset the environment to its initial state, beginning a new episode."""

    @abc.abstractmethod
    def is_episode_complete(self) -> bool:
        """True when the current episode is finished."""

    @abc.abstractmethod
    def get_observation(self) -> dict:
        """Return the current observation."""

    @abc.abstractmethod
    def apply_action(self, action: dict) -> None:
        """Apply one action to the environment."""
