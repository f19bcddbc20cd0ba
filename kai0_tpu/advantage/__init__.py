"""Stage Advantage: estimator-based per-frame advantage annotation + AWBC tooling.

Pipeline (reference ``stage_advantage/README.md:7-25``):
  0. manual ``stage_progress_gt`` annotation in the LeRobot parquets;
  1. train the estimator (``scripts/train.py <task>_advantage``, the
     :class:`kai0_tpu.models.advantage.AdvantageEstimatorConfig` value head);
  2. predict per-frame advantages over episode videos (:mod:`.evaluator` + :mod:`.annotate`);
  3. discretize advantages into task_index labels + advantage-suffixed prompts
     (:mod:`.discretize`);
  4. AWBC fine-tune (``scripts/train.py <task>_awbc`` with ``prompt_from_task=True``).
"""

from kai0_tpu.advantage.annotate import annotate_dataset  # noqa: F401
from kai0_tpu.advantage.discretize import discretize_dataset  # noqa: F401
from kai0_tpu.advantage.evaluator import SimpleValueEvaluator  # noqa: F401
