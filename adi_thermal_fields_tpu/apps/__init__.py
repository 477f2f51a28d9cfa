from .engine import EventLoop, make_cartesian_advance
