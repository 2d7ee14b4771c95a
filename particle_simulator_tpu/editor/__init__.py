"""Editor subsystem (headless): the functional surface of the reference's
particle_editor GUI — backend transport with loopback, frame timeline with
time-indexed scrubbing, drawing tools, presets, velocity-colored rendering —
driveable from the CLI (editor.headless), tests, or a future GUI shell."""

from particle_simulator_tpu.editor.backend import Backend
from particle_simulator_tpu.editor.core import Editor
from particle_simulator_tpu.editor.timeline import TimeInterval, Timeline
from particle_simulator_tpu.editor.tools import (
    LatticeKind,
    Stroke,
    Tool,
    ToolOptions,
    apply_stroke,
)

__all__ = [
    "Backend",
    "Editor",
    "TimeInterval",
    "Timeline",
    "LatticeKind",
    "Stroke",
    "Tool",
    "ToolOptions",
    "apply_stroke",
]
