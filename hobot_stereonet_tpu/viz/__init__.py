from . import colormap, server
