from prego_tpu.native.bindings import (
    NativeFeatureStore,
    build_native_library,
    native_available,
)

__all__ = ["NativeFeatureStore", "build_native_library", "native_available"]
