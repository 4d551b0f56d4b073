"""Abstract task base (reference SSRG/tasks/base_task.py:1-12)."""

from __future__ import annotations


class BaseTask:
    def execute(self, *args, **kwargs):
        raise NotImplementedError

    def evaluate(self, *args, **kwargs):
        raise NotImplementedError

    def train(self, *args, **kwargs):
        raise NotImplementedError
