"""Event system for the training/eval engines.

Replaces the reference's ignite dependency with a small in-house event engine.
Event names mirror ignite + the reference's custom IterationEvents
(monai/engines/utils.py:47).
"""
from __future__ import annotations

from collections import defaultdict
from collections.abc import Callable
from typing import Any

from ..utils.enums import StrEnum

__all__ = ["Events", "IterationEvents", "EventEmitter"]


class Events(StrEnum):
    STARTED = "started"
    EPOCH_STARTED = "epoch_started"
    GET_BATCH_STARTED = "get_batch_started"
    GET_BATCH_COMPLETED = "get_batch_completed"
    ITERATION_STARTED = "iteration_started"
    ITERATION_COMPLETED = "iteration_completed"
    EPOCH_COMPLETED = "epoch_completed"
    COMPLETED = "completed"
    EXCEPTION_RAISED = "exception_raised"
    INTERRUPT = "interrupt"
    TERMINATE = "terminate"


class IterationEvents(StrEnum):
    """Finer-grained intra-iteration events (reference: engines/utils.py:47)."""

    FORWARD_COMPLETED = "forward_completed"
    LOSS_COMPLETED = "loss_completed"
    BACKWARD_COMPLETED = "backward_completed"
    MODEL_COMPLETED = "model_completed"
    INNER_ITERATION_STARTED = "inner_iteration_started"
    INNER_ITERATION_COMPLETED = "inner_iteration_completed"


class EventEmitter:
    """Minimal ignite-style event registration/firing."""

    def __init__(self):
        self._event_handlers: dict[str, list[tuple[Callable, tuple, dict]]] = defaultdict(list)
        self._event_filters: dict[int, Callable] = {}

    def add_event_handler(self, event_name: str, handler: Callable, *args, **kwargs):
        every = kwargs.pop("every", None)
        filter_fn = kwargs.pop("event_filter", None)
        entry = (handler, args, kwargs)
        if every is not None and every > 1:
            def _filtered(engine, *a, _h=handler, _every=every, **k):
                counter = engine.state.epoch if "epoch" in str(event_name) else engine.state.iteration
                if counter % _every == 0:
                    return _h(engine, *a, **k)
            entry = (_filtered, args, kwargs)
        elif filter_fn is not None:
            def _filtered2(engine, *a, _h=handler, _f=filter_fn, **k):
                if _f(engine):
                    return _h(engine, *a, **k)
            entry = (_filtered2, args, kwargs)
        self._event_handlers[str(event_name)].append(entry)
        return handler

    def has_event_handler(self, handler: Callable, event_name: str | None = None) -> bool:
        events = [str(event_name)] if event_name else list(self._event_handlers)
        return any(h is handler for e in events for (h, _, _) in self._event_handlers.get(e, []))

    def remove_event_handler(self, handler: Callable, event_name: str):
        self._event_handlers[str(event_name)] = [
            (h, a, k) for (h, a, k) in self._event_handlers[str(event_name)] if h is not handler
        ]

    def on(self, event_name: str, *args, **kwargs):
        def decorator(f):
            self.add_event_handler(event_name, f, *args, **kwargs)
            return f

        return decorator

    def fire_event(self, event_name: str) -> None:
        for handler, args, kwargs in list(self._event_handlers.get(str(event_name), [])):
            handler(self, *args, **kwargs)
