from . import distributed, halo, mesh
