from .draw2d import draw_frame, load_groups, render

__all__ = ["draw_frame", "load_groups", "render"]
