"""Renderers/integrators: the flagship path tracer plus debug integrators
and inverse-rendering optimization."""

from ensem3a_openclraytracer_tpu.models.pathtracer import (
    render_image,
    render_radiance,
    render_radiance_jit,
    render_scene,
    trace,
)

__all__ = [
    "render_image",
    "render_radiance",
    "render_radiance_jit",
    "render_scene",
    "trace",
]
