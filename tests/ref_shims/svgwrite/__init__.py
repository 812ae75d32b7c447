"""Import-time stub for `svgwrite`, needed only because the reference
topo module imports showTOPO which imports svgwrite at module scope; every
call site that would USE it is commented out in the reference
(topo/topo.py:230,365,841,1083). Any actual use raises."""


class Drawing:  # pragma: no cover - never constructed by the oracle path
    def __init__(self, *a, **k):
        raise NotImplementedError("svgwrite stub: rendering not supported")


def __getattr__(name):  # pragma: no cover
    raise AttributeError(f"svgwrite stub has no '{name}'")
