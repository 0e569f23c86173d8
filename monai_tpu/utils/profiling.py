"""Profiling utilities.

Parity targets: monai/utils/profiling.py (WorkflowProfiler:154, ProfileHandler:401,
torch_profiler_full/time_cpu_gpu/time_end_to_end decorators :51-95).
TPU equivalents: wall-clock tracing of transform/handler calls + jax.profiler traces.
"""
from __future__ import annotations

import cProfile
import functools
import time
from collections import defaultdict
from contextlib import contextmanager
from threading import RLock
from typing import Any, Callable, NamedTuple

__all__ = ["WorkflowProfiler", "ProfileResult", "ProfileHandler", "select_transform_call",
           "time_end_to_end", "jax_profiler_trace"]


class ProfileResult(NamedTuple):
    name: str
    time: float
    filename: str
    lineno: int
    pid: int
    timestamp: float


def select_transform_call(frame) -> bool:
    """True for Transform.__call__ frames (reference: profiling.py:146)."""
    from ..transforms.transform import Transform

    self_obj = frame.f_locals.get("self", None)
    return frame.f_code.co_name == "__call__" and isinstance(self_obj, Transform)


class WorkflowProfiler:
    """Context manager collecting per-callable wall times
    (reference: profiling.py:154 — sys.settrace based; here an explicit profile() API
    plus trace of Transform.__call__ via monkeypatched apply)."""

    def __init__(self, call_selector: Callable = select_transform_call):
        self.results: dict[str, list[ProfileResult]] = defaultdict(list)
        self._lock = RLock()
        self.call_selector = call_selector
        self._prev_trace = None

    def _trace_call(self, frame, why, arg):
        import os
        import sys

        if why == "call" and self.call_selector(frame):
            start = time.perf_counter()
            name = type(frame.f_locals.get("self")).__name__

            def local_trace(frm, why2, arg2):
                if why2 == "return":
                    dur = time.perf_counter() - start
                    self.add_result(ProfileResult(name, dur, frame.f_code.co_filename,
                                                  frame.f_lineno, os.getpid(), time.time()))
                return local_trace

            return local_trace
        return None

    def __enter__(self):
        import sys

        self._prev_trace = sys.gettrace()
        sys.settrace(self._trace_call)
        return self

    def __exit__(self, *exc):
        import sys

        sys.settrace(self._prev_trace)

    def add_result(self, result: ProfileResult) -> None:
        with self._lock:
            self.results[result.name].append(result)

    @contextmanager
    def profile_ctx(self, name: str, caller=None):
        """Explicitly profile a block (reference: profiling.py profile_ctx)."""
        import os

        start = time.perf_counter()
        try:
            yield
        finally:
            dur = time.perf_counter() - start
            self.add_result(ProfileResult(name, dur, "", 0, os.getpid(), time.time()))

    def profile_callable(self, name: str | None = None):
        def deco(fn):
            _name = name or fn.__qualname__

            @functools.wraps(fn)
            def wrapper(*args, **kwargs):
                with self.profile_ctx(_name):
                    return fn(*args, **kwargs)

            return wrapper

        return deco

    def profile_iter(self, name: str, iterable):
        """Profile every step of an iterable (e.g. a data loader)."""

        def gen():
            it = iter(iterable)
            while True:
                try:
                    with self.profile_ctx(name):
                        item = next(it)
                    yield item
                except StopIteration:
                    return

        return gen()

    def get_results(self) -> dict:
        with self._lock:
            return dict(self.results)

    def get_times_summary(self) -> dict[str, tuple]:
        """name → (count, total, mean, min, max, std)."""
        import numpy as np

        out = {}
        for name, res in self.get_results().items():
            times = np.asarray([r.time for r in res])
            out[name] = (len(times), float(times.sum()), float(times.mean()), float(times.min()),
                         float(times.max()), float(times.std()))
        return out

    def get_times_summary_pd(self):
        import pandas as pd

        summ = self.get_times_summary()
        df = pd.DataFrame.from_dict(summ, orient="index",
                                    columns=["Count", "Total Time (s)", "Avg", "Min", "Max", "Std"])
        return df.sort_values("Total Time (s)", ascending=False)


class ProfileHandler:
    """Time engine events (reference: profiling.py:401)."""

    def __init__(self, name: str, profiler: WorkflowProfiler, start_event, end_event):
        self.name = name
        self.profiler = profiler
        self.start_event = start_event
        self.end_event = end_event
        self.ctx = None

    def attach(self, engine):
        engine.add_event_handler(self.start_event, self.start)
        engine.add_event_handler(self.end_event, self.end)
        return self

    def start(self, engine):
        self.ctx = self.profiler.profile_ctx(self.name)
        self.ctx.__enter__()

    def end(self, engine):
        if self.ctx is not None:
            self.ctx.__exit__(None, None, None)
        self.ctx = None


def time_end_to_end(fn: Callable) -> Callable:
    """Print wall time of a function (reference: profiling.py:95)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        res = fn(*args, **kwargs)
        print(f"end to end time of {fn.__qualname__}: {(time.perf_counter() - start) * 1000:.2f} ms")
        return res

    return wrapper


@contextmanager
def jax_profiler_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax/XLA device trace viewable in Perfetto/TensorBoard
    (TPU-native replacement for NVTX ranges, reference: monai/utils/nvtx.py)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PerfContext:
    """Accumulate perf_counter time across context blocks
    (reference: utils/profiling.py:121)."""

    def __init__(self):
        self.total_time: float = 0.0
        self.start_time = None

    def __enter__(self):
        import time

        self.start_time = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc_value, exc_traceback):
        import time

        if self.start_time is not None:
            self.total_time += time.perf_counter() - self.start_time
        self.start_time = None


class Range:
    """Named-scope profiling range: decorator and context manager
    (reference: monai/utils/nvtx.py:33 Range; here backed by ``jax.profiler``'s
    TraceAnnotation so ranges appear in TPU Perfetto traces instead of NVTX).
    """

    name_counter: dict = {}

    def __init__(self, name: str | None = None, methods=None,
                 append_method_name: bool | None = None, recursive: bool = False):
        self.name = name
        self.methods = methods
        self.append_method_name = append_method_name
        self.recursive = recursive

    def __call__(self, obj):
        if self.recursive:
            try:
                from ..transforms.compose import Compose

                if isinstance(obj, (list, tuple)):
                    return type(obj)(Range(recursive=True)(t) for t in obj)
                if isinstance(obj, Compose):
                    obj.transforms = tuple(Range(recursive=True)(t) for t in obj.transforms)
                    return obj
            except Exception:
                pass
        name = self.name
        if name is None:
            name = type(obj).__name__
            self.name_counter[name] = self.name_counter.get(name, 0) + 1
            if self.name_counter[name] > 1:
                name = f"{name}_{self.name_counter[name]}"
        methods = self.methods
        if methods is None:
            for cand in ("forward", "__call__", "__next__", "__getitem__"):
                if hasattr(type(obj), cand):
                    methods = [cand]
                    break
            else:
                raise ValueError(f"cannot infer method to annotate on {type(obj)}")
        elif isinstance(methods, str):
            methods = [methods]
        append = self.append_method_name
        if append is None:
            append = len(methods) > 1
        for m in methods:
            rng_name = f"{name}.{m}" if append else name
            self._wrap(obj, m, rng_name)
        return obj

    @staticmethod
    def _wrap(obj, method: str, name: str):
        import functools

        fn = getattr(type(obj), method)

        @functools.wraps(fn)
        def wrapped(self_, *args, **kwargs):
            import jax

            with jax.profiler.TraceAnnotation(name):
                return fn(self_, *args, **kwargs)

        try:
            setattr(obj, method, wrapped.__get__(obj))
        except AttributeError:
            setattr(type(obj), method, wrapped)

    def __enter__(self):
        import jax

        name = self.name or "Range"
        self._ann = jax.profiler.TraceAnnotation(name)
        self._ann.__enter__()
        return self

    def __exit__(self, exc_type, exc_value, exc_traceback):
        self._ann.__exit__(exc_type, exc_value, exc_traceback)


def torch_profiler_full(func):
    """Profile the decorated function and print the full trace table. The torch
    names are kept for surface parity; profiling here uses jax.profiler when a
    device is active, else a wall-clock report (reference:
    utils/profiling.py:51)."""
    import functools

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        from time import perf_counter

        start = perf_counter()
        result = func(*args, **kwargs)
        try:
            import jax

            jax.block_until_ready(result)
        except Exception:
            pass
        print(f"{func.__name__}: {perf_counter() - start:.6f} s (full profile: use "
              f"jax.profiler.trace for a Perfetto timeline)", flush=True)
        return result

    return wrapper


def torch_profiler_time_cpu_gpu(func):
    """Print host (dispatch) vs device (post-sync) time of the decorated function
    (reference: utils/profiling.py:70)."""
    import functools

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        from time import perf_counter

        t0 = perf_counter()
        result = func(*args, **kwargs)
        t_host = perf_counter() - t0
        try:
            import jax

            jax.block_until_ready(result)
        except Exception:
            pass
        t_total = perf_counter() - t0
        print(f"cpu time: {t_host * 1e6:.1f}us, device time: {(t_total - t_host) * 1e6:.1f}us",
              flush=True)
        return result

    return wrapper


def torch_profiler_time_end_to_end(func):
    """Print end-to-end (dispatch + device completion) time of the decorated
    function (reference: utils/profiling.py:95)."""
    import functools

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        from time import perf_counter

        start = perf_counter()
        result = func(*args, **kwargs)
        try:
            import jax

            jax.block_until_ready(result)
        except Exception:
            pass
        print(f"end to end time: {(perf_counter() - start) * 1e6:.1f}us", flush=True)
        return result

    return wrapper
