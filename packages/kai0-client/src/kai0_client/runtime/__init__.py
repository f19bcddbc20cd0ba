from kai0_client.runtime.agent import Agent
from kai0_client.runtime.environment import Environment
from kai0_client.runtime.runtime import Runtime
from kai0_client.runtime.subscriber import Subscriber

__all__ = ["Agent", "Environment", "Runtime", "Subscriber"]
