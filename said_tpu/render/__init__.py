"""Host-side visualization: software rasterizer + video muxing."""

from said_tpu.render.rasterizer import Renderer, render_blendshape_coefficients
from said_tpu.render.video import write_mjpeg_avi

__all__ = ["Renderer", "render_blendshape_coefficients", "write_mjpeg_avi"]
