"""Adapter from a BasePolicy to the runtime Agent interface.

Parity: reference ``openpi_client/runtime/agents/policy_agent.py:7-18``.
"""

from kai0_client import base_policy as _base_policy
from kai0_client.runtime.agent import Agent


class PolicyAgent(Agent):
    def __init__(self, policy: _base_policy.BasePolicy) -> None:
        self._policy = policy

    def get_action(self, observation: dict) -> dict:
        return self._policy.infer(observation)

    def reset(self) -> None:
        self._policy.reset()
