"""Experiment drivers: scene registry, GT generation, end-to-end runs.

TPU equivalents of the reference's 13 exp_* scene directories (SURVEY.md
§1 L3).  Each scene there is a copy-pasted script; here one config-driven
runner covers them all.
"""

from .scenes import SCENES, SceneSpec  # noqa: F401
from .create_gt import create_gt  # noqa: F401
from .run import run_experiment  # noqa: F401
