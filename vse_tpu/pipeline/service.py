"""Extraction service: task queue + progress/log fan-out.

Replaces the reference's process-based orchestration layer — ProcessManager
(reference backend/tools/process_manager.py:22-127), the RPC bridge
(reference backend/tools/subtitle_extractor_remote_call.py:5-67, commands
FINISH/PROGRESS/LOG/MANAGE_PROCESS/ERROR) and the GUI task loop (reference
ui/home_interface.py:307-399) — with an in-process service: one compiled
engine shared across the whole queue (the reference re-spawns a process and
reloads models per video), worker-thread execution, and callback-based
events. A GUI or RPC layer can attach to the same callbacks.
"""

from __future__ import annotations

import enum
import threading
import traceback
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

from vse_tpu.core.config import VseConfig
from vse_tpu.core.subtitle_area import SubtitleArea
from vse_tpu.pipeline.extractor import SubtitleExtractor
from vse_tpu.pipeline.ocr_engine import OcrEngine


class TaskStatus(enum.Enum):
    """Reference parity: ui/component/task_list_component.py:16-21."""

    PENDING = "pending"
    PROCESSING = "processing"
    COMPLETED = "completed"
    FAILED = "failed"


@dataclass
class ExtractionTask:
    video_path: str
    sub_area: Optional[SubtitleArea] = None
    output_path: Optional[str] = None
    status: TaskStatus = TaskStatus.PENDING
    progress: float = 0.0  # 0..100 overall (two channels / 2)
    error: Optional[str] = None
    srt_path: Optional[str] = None


@dataclass
class Callbacks:
    """The RPC bridge's command set as plain callables (reference
    subtitle_extractor_remote_call.py commands)."""

    on_progress: Optional[Callable[[ExtractionTask, float, float], None]] = None
    on_log: Optional[Callable[[ExtractionTask, str], None]] = None
    on_finish: Optional[Callable[[ExtractionTask], None]] = None
    on_error: Optional[Callable[[ExtractionTask, str], None]] = None


class ExtractionService:
    """Sequential task-queue worker over a shared engine (reference processes
    videos one at a time in a worker thread, ui/home_interface.py:320-393)."""

    def __init__(self, config: Optional[VseConfig] = None,
                 callbacks: Optional[Callbacks] = None,
                 isolation: str = "thread"):
        """`isolation="thread"` (default) shares one compiled engine across
        the queue; `"process"` runs each video in a spawned child with the
        reference's terminate->kill stop escalation (pipeline/isolation.py) —
        pays model load + XLA compile per video, but a crashing video can
        never take the service down."""
        if isolation not in ("thread", "process"):
            raise ValueError(f"isolation must be thread|process, got {isolation!r}")
        self.config = config or VseConfig()
        self.callbacks = callbacks or Callbacks()
        self.isolation = isolation
        self.tasks: List[ExtractionTask] = []
        self._engine: Optional[OcrEngine] = None
        self._worker: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._current_ex: Optional[SubtitleExtractor] = None
        self._current_runner = None  # ProcessRunner when isolation="process"

    def add_task(self, video_path: str, sub_area: Optional[SubtitleArea] = None,
                 output_path: Optional[str] = None) -> ExtractionTask:
        task = ExtractionTask(video_path, sub_area, output_path)
        with self._lock:
            self.tasks.append(task)
        return task

    def remove_task(self, task: ExtractionTask) -> bool:
        """Remove a task that is not currently processing (reference task
        list only mutates pending/finished rows)."""
        with self._lock:
            if task in self.tasks and task.status != TaskStatus.PROCESSING:
                self.tasks.remove(task)
                return True
        return False

    def invalidate_engine(self) -> None:
        """Drop the cached compiled engine (required after a config change
        that alters the model selection: language / mode / acceleration)."""
        self._engine = None

    @property
    def running(self) -> bool:
        return bool(self._worker and self._worker.is_alive())

    def run_all(self, block: bool = True) -> None:
        """Process the queue; one worker, engine reused across videos."""
        if self._worker and self._worker.is_alive():
            raise RuntimeError("service already running")
        self._stop.clear()
        self._worker = threading.Thread(target=self._drain, daemon=True)
        self._worker.start()
        if block:
            self._worker.join()

    def stop(self) -> None:
        """Cooperative stop (the reference escalates terminate->kill on real
        processes, process_manager.py:116-126): cancels the CURRENT video
        between device batches and drains no further tasks."""
        self._stop.set()
        ex = self._current_ex
        if ex is not None:
            ex.cancel.set()
        runner = self._current_runner
        if runner is not None:
            runner.stop()

    def _emit_log(self, task, msg):
        if self.callbacks.on_log:
            self.callbacks.on_log(task, msg)

    def _drain(self) -> None:
        while not self._stop.is_set():
            with self._lock:
                task = next(
                    (t for t in self.tasks if t.status == TaskStatus.PENDING), None
                )
            if task is None:
                return
            task.status = TaskStatus.PROCESSING
            if self.isolation == "process":
                self._run_isolated(task)
                continue
            try:
                ex = SubtitleExtractor(
                    task.video_path,
                    sub_area=task.sub_area,
                    config=self.config,
                    engine=self._engine,
                )
                self._current_ex = ex
                if task.output_path:
                    ex.subtitle_output_path = task.output_path

                def on_progress(fe, ocr, task=task):
                    task.progress = (fe + ocr) / 2.0
                    if self.callbacks.on_progress:
                        self.callbacks.on_progress(task, fe, ocr)

                ex.add_progress_listener(on_progress)
                ex.append_output = lambda *a, task=task: self._emit_log(
                    task, " ".join(str(x) for x in a)
                )
                task.srt_path = ex.run()
                self._engine = ex.engine
                task.status = TaskStatus.COMPLETED
                if self.callbacks.on_finish:
                    self.callbacks.on_finish(task)
            except Exception as e:  # FAILED surface, reference ERROR command
                task.status = TaskStatus.FAILED
                task.error = f"{e}\n{traceback.format_exc()}"
                if self.callbacks.on_error:
                    self.callbacks.on_error(task, str(e))
            finally:
                self._current_ex = None

    def _run_isolated(self, task: ExtractionTask) -> None:
        """One spawned child per video (reference ui/home_interface.py:
        453-456); FAILED on nonzero exit (reference :368-374)."""
        from vse_tpu.pipeline.isolation import ProcessRunner

        def on_progress(fe, ocr, task=task):
            task.progress = (fe + ocr) / 2.0
            if self.callbacks.on_progress:
                self.callbacks.on_progress(task, fe, ocr)

        runner = ProcessRunner(
            task.video_path, sub_area=task.sub_area,
            output_path=task.output_path, config=self.config,
            on_progress=on_progress,
            on_log=lambda msg, task=task: self._emit_log(task, msg),
        )
        self._current_runner = runner
        # same exception contract as the in-thread path: a spawn failure or
        # a raising user callback must mark THIS task FAILED and let the
        # worker keep draining, not kill the worker thread
        try:
            runner.start()
            while not runner.join(timeout=0.5):
                pass
            if runner.srt_path is not None:
                task.srt_path = runner.srt_path
                task.status = TaskStatus.COMPLETED
                if self.callbacks.on_finish:
                    self.callbacks.on_finish(task)
            else:
                task.status = TaskStatus.FAILED
                task.error = runner.error or "unknown child failure"
                if self.callbacks.on_error:
                    self.callbacks.on_error(task, task.error)
        except Exception as e:
            task.status = TaskStatus.FAILED
            task.error = f"{e}\n{traceback.format_exc()}"
            if self.callbacks.on_error:
                try:
                    self.callbacks.on_error(task, str(e))
                except Exception:
                    pass
        finally:
            self._current_runner = None
