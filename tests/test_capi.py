"""C ABI binding (native/c_api.cpp + openpose_tpu/capi.py).

Loads libopenpose_capi.so via ctypes inside this interpreter (the binding
reuses a running interpreter via PyGILState; see c_api.cpp) and drives
create -> process -> render -> destroy, i.e. the same surface the
reference's Unity plugin exposes (unityBinding.cpp _OPConfigure*/_OPRun).
"""

import ctypes
import json
import os

import numpy as np
import pytest

@pytest.fixture(scope="module")
def capi():
    from openpose_tpu.utils.native_build import ensure_built
    path = ensure_built("libopenpose_capi.so")
    if path is None:
        pytest.skip("libopenpose_capi.so build failed (make -C native): "
                    + ensure_built.last_error)
    _LIB = str(path)
    # Warm sys.modules so the embedded PyImport_ImportModule bypasses
    # pytest's assertion-rewriting meta-path hook.
    import openpose_tpu.capi  # noqa: F401
    lib = ctypes.CDLL(_LIB)
    lib.op_create.restype = ctypes.c_void_p
    lib.op_create.argtypes = [ctypes.c_char_p]
    lib.op_process.restype = ctypes.c_int
    lib.op_process.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.op_render.restype = ctypes.c_int
    lib.op_render.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
    lib.op_last_error.restype = ctypes.c_char_p
    lib.op_destroy.argtypes = [ctypes.c_void_p]
    lib.op_free_floats.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.op_free_bytes.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
    return lib


def _image(h=96, w=128, seed=0):
    rng = np.random.RandomState(seed)
    return np.ascontiguousarray(
        rng.randint(0, 255, (h, w, 3), np.uint8))


def test_capi_process_roundtrip(capi):
    cfg = json.dumps({"model_pose": "BODY_25",
                      "net_resolution": "-1x64",
                      "compute_dtype": "float32"}).encode()
    handle = capi.op_create(cfg)
    assert handle, capi.op_last_error().decode()

    img = _image()
    kp_ptr = ctypes.POINTER(ctypes.c_float)()
    people = ctypes.c_int()
    parts = ctypes.c_int()
    rc = capi.op_process(
        handle, img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        img.shape[0], img.shape[1], ctypes.byref(kp_ptr),
        ctypes.byref(people), ctypes.byref(parts))
    assert rc == 0, capi.op_last_error().decode()
    if people.value > 0:  # random weights: any people count is legitimate
        assert parts.value == 25
        kp = np.ctypeslib.as_array(kp_ptr,
                                   shape=(people.value, parts.value, 3))
        assert np.isfinite(kp).all()
        capi.op_free_floats(kp_ptr)
    capi.op_destroy(handle)


def test_capi_render(capi):
    handle = capi.op_create(json.dumps(
        {"net_resolution": "-1x64", "compute_dtype": "float32"}).encode())
    assert handle, capi.op_last_error().decode()
    img = _image(80, 112, seed=1)
    frame_ptr = ctypes.POINTER(ctypes.c_ubyte)()
    rc = capi.op_render(
        handle, img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        img.shape[0], img.shape[1], ctypes.byref(frame_ptr))
    assert rc == 0, capi.op_last_error().decode()
    out = np.ctypeslib.as_array(frame_ptr, shape=img.shape).copy()
    assert out.shape == img.shape
    capi.op_free_bytes(frame_ptr)
    capi.op_destroy(handle)


def test_capi_bad_arguments(capi):
    kp_ptr = ctypes.POINTER(ctypes.c_float)()
    people = ctypes.c_int()
    parts = ctypes.c_int()
    rc = capi.op_process(None, None, 0, 0, ctypes.byref(kp_ptr),
                         ctypes.byref(people), ctypes.byref(parts))
    assert rc != 0
    assert b"bad arguments" in capi.op_last_error()


def test_capi_bad_config(capi):
    handle = capi.op_create(b"{\"model_pose\": \"NOPE\"}")
    assert not handle
    assert b"NOPE" in capi.op_last_error()
