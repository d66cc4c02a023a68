from . import colormap
