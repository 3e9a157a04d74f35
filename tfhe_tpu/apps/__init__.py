from . import trivium
