from . import collectives
from .mesh import COL_AXIS, ROW_AXIS, Grid

__all__ = ["collectives", "Grid", "ROW_AXIS", "COL_AXIS"]
