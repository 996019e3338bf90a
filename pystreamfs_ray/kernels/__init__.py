"""Online feature-selection kernels (numpy re-derivations, Ray-free).

Each kernel implements the ``SelectorKernel`` protocol from ``base.py``
and is registered by name. The same pure functions serve as (a) the
engine kernels run inside parallel group tasks / actor pools and (b) the
single-process sequential oracle used by the test suite — so engine ↔
oracle parity is exact by construction, and oracle ↔ reference parity is
asserted in tests against the reference implementations where importable
(`/root/reference/pystreamfs/algorithms/*.py`).
"""

from pystreamfs_ray.kernels.base import KERNELS, SelectorKernel, get_kernel  # noqa: F401
from pystreamfs_ray.kernels import ofs, efs, fsds, cancelout, mcnn  # noqa: F401,E402
