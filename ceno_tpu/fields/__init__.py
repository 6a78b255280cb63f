"""Field arithmetic kernels: BabyBear (+Ext4), Goldilocks (+Ext2)."""

from . import babybear, ext4, goldilocks  # noqa: F401
