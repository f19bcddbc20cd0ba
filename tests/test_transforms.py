import numpy as np
import pytest

from kai0_tpu import transforms
from kai0_tpu.shared.normalize import NormStats


def test_repack():
    t = transforms.RepackTransform({"images": {"cam": "obs/img"}, "state": "obs/state"})
    out = t({"obs": {"img": np.zeros(3), "state": np.ones(2)}})
    assert set(out) == {"images", "state"}
    np.testing.assert_array_equal(out["images"]["cam"], np.zeros(3))


def test_inject_default_prompt():
    t = transforms.InjectDefaultPrompt("do the thing")
    out = t({})
    assert out["prompt"].item() == "do the thing"
    out = t({"prompt": np.asarray("other")})
    assert out["prompt"].item() == "other"


def test_insert_advantage():
    t = transforms.InsertAdvantageIntoPrompt()
    out = t({"prompt": "fold", "advantage": 0.25})
    assert out["prompt"] == "fold, Advantage: 0.2500"


def test_normalize_roundtrip():
    stats = {"state": NormStats(mean=np.array([1.0, 2.0]), std=np.array([0.5, 2.0]))}
    n = transforms.Normalize(stats)
    u = transforms.Unnormalize(stats)
    data = {"state": np.array([2.0, 6.0])}
    normed = n(dict(data))
    np.testing.assert_allclose(normed["state"], [(2.0 - 1.0) / (0.5 + 1e-6), (6.0 - 2.0) / (2.0 + 1e-6)])
    round_ = u(normed)
    np.testing.assert_allclose(round_["state"], data["state"], atol=1e-5)


def test_normalize_quantile_roundtrip():
    stats = {
        "actions": NormStats(
            mean=np.zeros(2), std=np.ones(2), q01=np.array([-1.0, -2.0]), q99=np.array([1.0, 2.0])
        )
    }
    n = transforms.Normalize(stats, use_quantiles=True)
    u = transforms.Unnormalize(stats, use_quantiles=True)
    data = {"actions": np.array([[0.5, 1.0]])}
    out = u(n({"actions": data["actions"].copy()}))
    np.testing.assert_allclose(out["actions"], data["actions"], atol=1e-5)


def test_unnormalize_pads_missing_dims():
    # Unnormalize pads stats to the data dim (identity for extra dims).
    stats = {"actions": NormStats(mean=np.array([1.0]), std=np.array([2.0]))}
    u = transforms.Unnormalize(stats)
    out = u({"actions": np.array([1.0, 5.0])})
    np.testing.assert_allclose(out["actions"], [1.0 * (2.0 + 1e-6) + 1.0, 5.0 * (1.0 + 1e-6)])


def test_delta_absolute_roundtrip():
    mask = transforms.make_bool_mask(2, -1)
    state = np.array([1.0, 2.0, 3.0])
    actions = np.tile(np.array([10.0, 20.0, 30.0]), (5, 1))
    d = transforms.DeltaActions(mask)
    a = transforms.AbsoluteActions(mask)
    out = d({"state": state, "actions": actions.copy()})
    np.testing.assert_allclose(out["actions"][0], [9.0, 18.0, 30.0])
    back = a(out)
    np.testing.assert_allclose(back["actions"], actions)


def test_make_bool_mask():
    assert transforms.make_bool_mask(2, -2, 2) == (True, True, False, False, True, True)
    assert transforms.make_bool_mask(2, 0, 2) == (True, True, True, True)


def test_pad_to_dim():
    x = np.ones((2, 3))
    out = transforms.pad_to_dim(x, 5)
    assert out.shape == (2, 5)
    np.testing.assert_array_equal(out[:, 3:], 0)
    assert transforms.pad_to_dim(x, 2).shape == (2, 3)  # no truncation


def test_transform_dict_rename_and_remove():
    tree = {"a": {"b": 1}, "c": 2, "d": 3}
    out = transforms.transform_dict({"a/b": "x/y", "c": None}, tree)
    assert out == {"x": {"y": 1}, "d": 3}


def test_transform_dict_regex_backreference():
    tree = {"cam_left": 1, "cam_right": 2}
    out = transforms.transform_dict({r"cam_(\w+)": r"images/\1"}, tree)
    assert out == {"images": {"left": 1, "right": 2}}


def test_transform_dict_duplicate_error():
    with pytest.raises(ValueError):
        transforms.transform_dict({"a": "x", "b": "x"}, {"a": 1, "b": 2})


def test_flatten_unflatten():
    tree = {"a": {"b": {"c": 1}}, "d": 2}
    flat = transforms.flatten_dict(tree)
    assert flat == {"a/b/c": 1, "d": 2}
    assert transforms.unflatten_dict(flat) == tree


def test_pad_states_and_actions():
    t = transforms.PadStatesAndActions(5)
    out = t({"state": np.ones(3), "actions": np.ones((4, 3))})
    assert out["state"].shape == (5,)
    assert out["actions"].shape == (4, 5)


def test_prompt_from_lerobot_task():
    t = transforms.PromptFromLeRobotTask({0: "fold the cloth, Advantage: positive"})
    out = t({"task_index": np.int64(0)})
    assert out["prompt"] == "fold the cloth, Advantage: positive"
    with pytest.raises(ValueError):
        t({"task_index": 7})


def test_group_push_ordering():
    g = transforms.Group(inputs=("a",), outputs=("b",))
    g2 = g.push(inputs=("c",), outputs=("d",))
    assert g2.inputs == ("a", "c")
    assert g2.outputs == ("d", "b")
