"""Core geometry: quaternions, rotation reps, skeleton FK/IK, HumanML codec."""
from . import hml_codec, quaternions, rotations, skeleton  # noqa: F401
