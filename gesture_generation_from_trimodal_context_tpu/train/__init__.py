from .state import NetState, make_net_state, adam  # noqa: F401
