"""Optimizers and the inverse-rendering outer loop."""

from .adam_modified import adam_modified, AdamModifiedState  # noqa: F401
