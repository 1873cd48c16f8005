"""Models: backbones, heads, attention modules, POCO composition."""

from .poco import (
    POCO,
    PocoConfig,
    build_hmr,
    build_poco_cliff,
    build_poco_pare,
    init_poco,
)
