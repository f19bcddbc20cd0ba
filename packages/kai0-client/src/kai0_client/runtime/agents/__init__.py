from kai0_client.runtime.agents.policy_agent import PolicyAgent

__all__ = ["PolicyAgent"]
