"""spray_tpu — TPU-native differentiable speculative ray tracer.

Import-time TPU tuning: the traversal kernels stage multi-MB ray blocks and
BVH pages through scoped VMEM; the default 16 MiB scoped-vmem budget both
OOMs compiles at wavefront sizes >= 512 packets and forfeits a measured 2x
on the routed multi-domain path.  Set before libtpu initializes (any
`import spray_tpu.*` precedes first TPU use in every entry point).
"""

import os as _os

_args = _os.environ.get("LIBTPU_INIT_ARGS", "")
if "xla_tpu_scoped_vmem_limit_kib" not in _args:
    _os.environ["LIBTPU_INIT_ARGS"] = (
        _args + " --xla_tpu_scoped_vmem_limit_kib=49152"
    ).strip()
