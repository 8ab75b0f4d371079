from .gorilla import gorilla_decode, gorilla_encode  # noqa: F401
from .deltadelta import dod_decode, dod_encode  # noqa: F401
