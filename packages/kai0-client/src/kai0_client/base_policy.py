"""Policy ABC shared by server-side policies and network clients.

Parity: reference ``packages/openpi-client/src/openpi_client/base_policy.py:5-12``.
"""

import abc


class BasePolicy(abc.ABC):
    @abc.abstractmethod
    def infer(self, obs: dict) -> dict:
        """Infer actions given an observation."""

    def reset(self) -> None:
        """Reset the policy to its initial state."""
