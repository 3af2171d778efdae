"""Video-SfM pipeline layer (SURVEY.md §3.2, L5/L6).

Composes the registration / triangulation / bundle-adjustment building
blocks into the incremental session workflow the reference exposes over
its service frontend: ``add_frame(matches) → register (PnP/RANSAC) →
triangulate new tracks → windowed BA``.
"""
from .session import SfmSession

__all__ = ["SfmSession"]
