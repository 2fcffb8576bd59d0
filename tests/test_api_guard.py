"""Function-contract decorator surface (FIXTURES.md F6) — messages mirror
reference src/function-contracts.js:28-67 and the blame algebra at
:91-152."""

from __future__ import annotations

import pytest

from rho_contracts_ray import c
from rho_contracts_ray.contracts.errors import (
    ContractLibraryError, RowContractError,
)
from rho_contracts_ray.functions.api_guard import (
    contract_fn, fn, fun, publish, wrap, wrap_all,
)


def add(x, y):
    return x + y


def test_fn_happy_path():
    g = wrap(fn(c.number, c.number).returns(c.number), add)
    assert g(2, 3) == 5


def test_wrong_number_of_arguments():
    g = wrap(fn(c.number, c.number), add, "add")
    with pytest.raises(RowContractError, match=r"Wrong number of arguments, "
                                               r"expected 2 but got 1"):
        g(1)


def test_too_few_and_too_many_with_optional():
    g = wrap(fn(c.number, c.optional(c.number)), lambda x, y=0: x, "f")
    with pytest.raises(RowContractError, match=r"Too few arguments, expected "
                                               r"at least 1 but got 0"):
        g()
    with pytest.raises(RowContractError, match=r"Too many arguments, expected "
                                               r"at most 2 but got 3"):
        g(1, 2, 3)
    assert g(1) == 1 and g(1, 2) == 1


def test_argument_blames_caller():
    g = wrap(fn(c.number), lambda x: x, "f")
    with pytest.raises(RowContractError) as ei:
        g("nope")
    msg = ei.value.violation.message
    assert "broke the contract on `f()`:" in msg       # caller's fault
    assert "Expected number, but got 'nope'" in msg
    assert "for the 1st argument of the call." in msg


def test_result_blames_function():
    g = wrap(fn(c.number).returns(c.string), lambda x: x, "f")
    with pytest.raises(RowContractError) as ei:
        g(1)
    msg = ei.value.violation.message
    assert "`f()` broke its contract:" in msg          # f's fault
    assert "Expected string, but got 1" in msg
    assert "for the return value of the call." in msg


def test_named_arguments_blame_by_name():
    g = wrap(fun({"fstArg": c.number}, {"sndArg": c.string}),
             lambda a, b: a, "f")
    with pytest.raises(RowContractError, match="sndArg"):
        g(1, 2)


def test_extra_args_contract():
    g = wrap(fn(c.number).extraArgs(c.array(c.string)), lambda x, *r: x, "f")
    assert g(1, "a", "b") == 1
    with pytest.raises(RowContractError, match="extra argument"):
        g(1, "a", 5)


def test_fun_arg_spec_validation():
    with pytest.raises(ContractLibraryError, match="exactly one key"):
        fun({"a": c.number, "b": c.string})
    with pytest.raises(ContractLibraryError, match="got a contract"):
        fun(c.number)
    with pytest.raises(ContractLibraryError, match="expected an object"):
        fun("x")


def test_optional_before_required_rejected():
    with pytest.raises(ContractLibraryError,
                       match="cannot follow an optional"):
        fn(c.optional(c.number), c.string)


def test_check_refuses_wrapping_contract():
    with pytest.raises(ContractLibraryError,
                       match="This contract requires wrapping"):
        c.check(fn(c.number), lambda x: x)


def test_or_rejects_two_wrapping_contracts():
    with pytest.raises(ContractLibraryError, match="at most one wrapping"):
        c.or_(fn(c.number), fn(c.string))


def test_decorator_sugar():
    @contract_fn(c.number, c.number, returns=c.number)
    def mul(a, b):
        return a * b

    assert mul(3, 4) == 12
    with pytest.raises(RowContractError):
        mul(3, "x")


def test_fn_tostring():
    f = fn(c.number, c.string).returns(c.bool)
    assert f.to_string() == "c.fn(c.number, c.string -> c.bool)"
    g = fun({"x": c.number}).returns(c.any)
    assert g.to_string() == "c.fun({ x: c.number } -> c.any())"


def test_publish_and_wrap_all():
    impl = {"inc": lambda x: x + 1, "name": "mod"}
    out = publish("m", impl, {"inc": fn(c.number).returns(c.number)},
                  additional_exports={"name": impl["name"]})
    assert out["inc"](1) == 2 and out["name"] == "mod"
    with pytest.raises(RowContractError):
        out["inc"]("x")
    with pytest.raises(ContractLibraryError,
                       match="missing is missing in the implementation"):
        wrap_all(impl, {"missing": fn()})


def test_wrap_plain_data_contract_checks_eagerly():
    assert wrap(c.number, 5) == 5
    with pytest.raises(RowContractError):
        wrap(c.number, "x")


def test_inspection_depth_setting():
    from rho_contracts_ray.contracts import jsval

    deep = {"a": {"b": {"c": {"d": {"e": 1}}}}}
    jsval.set_error_message_inspection_depth(1)
    try:
        assert "[Object]" in jsval.inspect(deep)
    finally:
        jsval.set_error_message_inspection_depth(5)
    assert "[Object]" not in jsval.inspect(deep)
