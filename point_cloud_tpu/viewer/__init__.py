"""The viewer application: streaming + camera + rendering, headless.

TPU-native re-design of the reference's windowed app (reference:
src/app.rs + the plugin stack, SURVEY.md section 1): the bevy ECS plugin
graph becomes one explicit per-frame ``Viewer.update`` pipeline, and the
winit/wgpu surface becomes offscreen RGB/depth frames (save them, stream
them, or drive them from a notebook). The egui control panel's state and
statistics live on ``Viewer`` as plain fields + the ``stats()`` dict.
"""

from .app import Viewer, ViewerInput  # noqa: F401
