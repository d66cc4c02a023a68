from . import halo, mesh
