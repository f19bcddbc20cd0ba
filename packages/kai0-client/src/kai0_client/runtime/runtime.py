"""The environment/agent episode loop with max-Hz pacing.

Parity: reference ``openpi_client/runtime/runtime.py:11-92`` — runs episodes of
observe → act → apply at a bounded rate, notifying subscribers at each step and at
episode boundaries.
"""

from __future__ import annotations

import logging
import time

from kai0_client.runtime.agent import Agent
from kai0_client.runtime.environment import Environment
from kai0_client.runtime.subscriber import Subscriber

logger = logging.getLogger(__name__)


class Runtime:
    def __init__(
        self,
        environment: Environment,
        agent: Agent,
        subscribers: list[Subscriber] | None = None,
        *,
        max_hz: float = 0.0,
        num_episodes: int = 1,
        max_episode_steps: int = 0,
    ) -> None:
        self._environment = environment
        self._agent = agent
        self._subscribers = list(subscribers or [])
        self._max_hz = max_hz
        self._num_episodes = num_episodes
        self._max_episode_steps = max_episode_steps
        self._in_episode = False

    def run(self) -> None:
        for _ in range(self._num_episodes):
            self._run_episode()

    def mark_episode_complete(self) -> None:
        self._in_episode = False

    def _run_episode(self) -> None:
        self._environment.reset()
        self._agent.reset()
        for sub in self._subscribers:
            sub.on_episode_start()

        self._in_episode = True
        step = 0
        step_time = 1.0 / self._max_hz if self._max_hz > 0 else 0.0
        last_step = time.time()

        while self._in_episode:
            observation = self._environment.get_observation()
            action = self._agent.get_action(observation)
            self._environment.apply_action(action)
            for sub in self._subscribers:
                sub.on_step(observation, action)

            step += 1
            if self._environment.is_episode_complete():
                self._in_episode = False
            if self._max_episode_steps and step >= self._max_episode_steps:
                self._in_episode = False

            if step_time > 0:
                now = time.time()
                remaining = step_time - (now - last_step)
                if remaining > 0:
                    time.sleep(remaining)
                last_step = time.time()

        for sub in self._subscribers:
            sub.on_episode_end()
