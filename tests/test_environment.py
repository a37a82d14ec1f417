"""Environment capability guards (round-2 verdict weak #8).

The suite's only intended skips are deterministic parameter-combo skips
("window longer than input" in test_pallas.py).  The capabilities that
*gate* real coverage must be present, so a broken toolchain fails the
suite instead of silently skipping it hollow.
"""


def test_pallas_available():
    from kmers_tpu.ops.pallas import HAVE_PALLAS

    assert HAVE_PALLAS, (
        "pallas import failed: every kernel test would silently skip"
    )


def test_native_scanner_available():
    from kmers_tpu.io import native_available

    assert native_available(), (
        "C++ FASTX scanner failed to build/load: native-path tests would "
        "silently skip (g++ is a baked-in dependency of this image)"
    )


def test_virtual_mesh_present():
    import jax

    assert len(jax.devices()) >= 8, (
        "tests require the 8-device virtual CPU mesh (conftest.py sets "
        "xla_force_host_platform_device_count=8)"
    )
