"""Autoencoder model factories — the reference's architecture contract in
pure numpy.

The reference's production models are Keras autoencoders built by
registered factory functions:

- ``feedforward_model`` / ``feedforward_symmetric`` / ``feedforward_hourglass``
  (/root/reference/gordo/machine/model/factories/feedforward_autoencoder.py:15-251,
  dim arithmetic factories/utils.py:7-41, doctests at
  feedforward_autoencoder.py:223-238)
- ``lstm_model`` / ``lstm_symmetric`` / ``lstm_hourglass``
  (factories/lstm_autoencoder.py:17-263 — SAME hourglass dim math)
- registry ``register_model_builder``
  (/root/reference/gordo/machine/model/register.py:10-75)

The deep-model backend is IMPORT-GATED (mirror of the multimodal PIL
pattern): when ``tensorflow`` imports, every factory — feedforward AND
the 3-D LSTM family — builds a real compiled Keras ``Sequential``
(``KerasSequentialAdapter``);
otherwise — as in this environment — the same ``Layer`` spec drives a
deterministic trainable substitute, a seeded full-batch
gradient-descent numpy MLP with sklearn-style ``fit(X, y)`` /
``predict(X)``. Either way the module reproduces the reference's
architecture contract EXACTLY — layer counts, per-layer units
(``hourglass_calc_dims``), activation wiring, the
``type -> kind -> builder`` registry with its ``n_features`` validation
— and every factory output flows through ``PythonEstimatorModel`` /
``builder.py`` end-to-end. Tests parameterize over both branches
(keras skipped where tensorflow is absent), so production parity is a
pip install, not a rewrite; ``backend="numpy"`` pins the stand-in.

LSTM variants: the layer spec (units per LSTM layer + Dense out) follows
the reference bit-for-bit; the trainable substitute flattens the lookback
window into lagged features (the LaggedLinearModel data flow) rather than
reproducing LSTM cell math — documented substitution, not parity.
"""

from __future__ import annotations

import inspect
import math
from dataclasses import dataclass

import numpy as np


# --------------------------------------------------------------- dim math
def hourglass_calc_dims(
    compression_factor: float, encoding_layers: int, n_features: int
) -> tuple[int, ...]:
    """Encoder layer widths: a straight line from ``n_features`` down to
    the bottleneck ``ceil(compression_factor * n_features)`` (clamped to
    ``[1, n_features]``), sampled at each encoder depth with Python's
    banker's rounding. Behavioral parity with the reference factory's dim
    arithmetic (gordo/machine/model/factories/utils.py:7-41) — original
    expression here; the doctest values are the parity oracle.

    >>> hourglass_calc_dims(0.2, 3, 10)
    (7, 5, 2)
    >>> hourglass_calc_dims(0.5, 2, 8)
    (6, 4)
    """
    # NaN-rejecting form: `not (0 <= cf <= 1)` is True for NaN, where
    # `cf < 0 or cf > 1` would silently let NaN through
    if not (0 <= compression_factor <= 1):
        raise ValueError(
            "compression_factor is a ratio of n_features and has to lie "
            f"inside [0, 1]; got {compression_factor}"
        )
    if encoding_layers < 1:
        raise ValueError(
            f"an hourglass needs at least one encoding layer; got "
            f"{encoding_layers}"
        )
    # clamp order matters at n_features=0: min-then-max yields 1 (the
    # reference's convention), max-then-min would yield 0-width layers
    bottleneck = max(
        min(math.ceil(compression_factor * n_features), n_features), 1
    )
    step = (n_features - bottleneck) / encoding_layers
    widths: list[int] = []
    for depth in range(1, encoding_layers + 1):
        widths.append(round(n_features - depth * step))
    return tuple(widths)


def check_dim_func_len(prefix: str, dim: tuple, func: tuple) -> None:
    """One activation per layer width — reject mismatched ``*_dim`` /
    ``*_func`` tuples up front (reference factories/utils.py:44-63
    behavior, re-expressed)."""
    if len(dim) != len(func):
        raise ValueError(
            f"got {len(dim)} {prefix}_dim widths but {len(func)} "
            f"{prefix}_func activations — each layer width needs exactly "
            f"one activation; when only one of the pair is supplied, its "
            f"length has to match the derived default of the other"
        )


# ---------------------------------------------------------------- registry
class register_model_builder:
    """``type -> kind -> builder`` factory registry
    (register.py:10-75 parity, including the ``n_features`` arg check)."""

    factories: dict[str, dict[str, object]] = {}

    def __init__(self, type: str):
        self.type = type

    def __call__(self, model):
        self._validate_func(model)
        self.factories.setdefault(self.type, {})[model.__name__] = model
        return model

    @staticmethod
    def _validate_func(func) -> None:
        if "n_features" not in inspect.getfullargspec(func).args:
            raise ValueError(
                f"cannot register builder {func.__name__!r}: every model "
                "builder takes an 'n_features' argument (the input width "
                "is only known at fit time)"
            )


# ----------------------------------------------------------- numpy MLP
@dataclass
class Layer:
    """One layer of the spec; ``units`` mirrors Keras ``Dense.units`` /
    ``LSTM.units`` so the reference's doctests translate verbatim."""

    units: int
    activation: str
    kind: str = "dense"


_ACT = {
    "tanh": (np.tanh, lambda a: 1.0 - a * a),
    "relu": (lambda z: np.maximum(z, 0.0), lambda a: (a > 0).astype(a.dtype)),
    "linear": (lambda z: z, lambda a: np.ones_like(a)),
}


class NumpyAutoEncoder:
    """Deterministic MLP over a layer spec: seeded Glorot-uniform init,
    full-batch gradient descent on MSE — the trainable stand-in for the
    compiled Keras Sequential.

    >>> m = feedforward_hourglass(10)
    >>> len(m.layers)
    7
    >>> [m.layers[i].units for i in range(len(m.layers))]
    [8, 7, 5, 5, 7, 8, 10]
    """

    def __init__(
        self,
        layers: list[Layer],
        n_features: int,
        lr: float = 0.05,
        epochs: int = 200,
        seed: int = 0,
    ):
        self.layers = list(layers)
        self.n_features = n_features
        self.lr = lr
        self.epochs = epochs
        self.seed = seed
        self.weights_: list[np.ndarray] | None = None
        self.biases_: list[np.ndarray] | None = None
        for lay in self.layers:
            if lay.activation not in _ACT:
                raise ValueError(f"unknown activation {lay.activation!r}")

    def _init_params(self):
        rng = np.random.RandomState(self.seed)
        dims = [self.n_features] + [lay.units for lay in self.layers]
        W, b = [], []
        for i in range(len(self.layers)):
            fan_in, fan_out = dims[i], dims[i + 1]
            limit = math.sqrt(6.0 / (fan_in + fan_out))
            W.append(rng.uniform(-limit, limit, size=(fan_in, fan_out)))
            b.append(np.zeros(fan_out))
        return W, b

    def _forward(self, X, W, b):
        acts = [X]
        for i, lay in enumerate(self.layers):
            z = acts[-1] @ W[i] + b[i]
            acts.append(_ACT[lay.activation][0](z))
        return acts

    def fit(self, X: np.ndarray, y: np.ndarray | None = None) -> "NumpyAutoEncoder":
        """MSE full-batch GD; ``y`` defaults to ``X`` (autoencoder)."""
        X = np.asarray(X, dtype=np.float64)
        Y = X if y is None else np.asarray(y, dtype=np.float64)
        if Y.ndim == 1:
            Y = Y[:, None]
        W, b = self._init_params()
        n = len(X)
        for _ in range(self.epochs):
            acts = self._forward(X, W, b)
            delta = (acts[-1] - Y) * _ACT[self.layers[-1].activation][1](acts[-1])
            for i in range(len(self.layers) - 1, -1, -1):
                gW = acts[i].T @ delta / n
                gb = delta.mean(axis=0)
                if i > 0:
                    delta = (delta @ W[i].T) * _ACT[self.layers[i - 1].activation][1](
                        acts[i]
                    )
                W[i] -= self.lr * gW
                b[i] -= self.lr * gb
        self.weights_, self.biases_ = W, b
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        if self.weights_ is None:
            raise ValueError("model is not fitted")
        X = np.asarray(X, dtype=np.float64)
        return self._forward(X, self.weights_, self.biases_)[-1]


# ------------------------------------------------- feedforward factories
@register_model_builder(type="KerasAutoEncoder")
def feedforward_model(
    n_features: int,
    n_features_out: int | None = None,
    encoding_dim: tuple[int, ...] = (256, 128, 64),
    encoding_func: tuple[str, ...] = ("tanh", "tanh", "tanh"),
    decoding_dim: tuple[int, ...] = (64, 128, 256),
    decoding_func: tuple[str, ...] = ("tanh", "tanh", "tanh"),
    out_func: str = "linear",
    **kwargs,
) -> NumpyAutoEncoder:
    """feedforward_autoencoder.py:15-117 parity: encoder stack + decoder
    stack + output layer (n_features_out, out_func)."""
    n_features_out = n_features_out or n_features
    check_dim_func_len("encoding", encoding_dim, encoding_func)
    check_dim_func_len("decoding", decoding_dim, decoding_func)
    layers = [
        Layer(u, a) for u, a in zip(encoding_dim, encoding_func)
    ] + [Layer(u, a) for u, a in zip(decoding_dim, decoding_func)]
    layers.append(Layer(n_features_out, out_func))
    return _build_estimator(layers, n_features, **_train_kwargs(kwargs))


@register_model_builder(type="KerasAutoEncoder")
def feedforward_symmetric(
    n_features: int,
    n_features_out: int | None = None,
    dims: tuple[int, ...] = (256, 128, 64),
    funcs: tuple[str, ...] = ("tanh", "tanh", "tanh"),
    **kwargs,
) -> NumpyAutoEncoder:
    """feedforward_autoencoder.py:120-156 parity: encoder dims mirrored
    for the decoder."""
    if not dims:
        raise ValueError(
            "a symmetric autoencoder needs at least one encoder width "
            "in dims"
        )
    enc, fns = tuple(dims), tuple(funcs)
    return feedforward_model(
        n_features,
        n_features_out,
        encoding_dim=enc,
        decoding_dim=enc[::-1],
        encoding_func=fns,
        decoding_func=fns[::-1],
        **kwargs,
    )


@register_model_builder(type="KerasAutoEncoder")
def feedforward_hourglass(
    n_features: int,
    n_features_out: int | None = None,
    encoding_layers: int = 3,
    compression_factor: float = 0.5,
    func: str = "tanh",
    **kwargs,
) -> NumpyAutoEncoder:
    """feedforward_autoencoder.py:159-251 parity — reference doctests:

    >>> model = feedforward_hourglass(10)
    >>> len(model.layers)
    7
    >>> [model.layers[i].units for i in range(len(model.layers))]
    [8, 7, 5, 5, 7, 8, 10]
    >>> model = feedforward_hourglass(5)
    >>> [model.layers[i].units for i in range(len(model.layers))]
    [4, 4, 3, 3, 4, 4, 5]
    >>> model = feedforward_hourglass(10, compression_factor=0.2)
    >>> [model.layers[i].units for i in range(len(model.layers))]
    [7, 5, 2, 2, 5, 7, 10]
    >>> model = feedforward_hourglass(10, encoding_layers=1)
    >>> [model.layers[i].units for i in range(len(model.layers))]
    [5, 5, 10]
    """
    dims = hourglass_calc_dims(compression_factor, encoding_layers, n_features)
    return feedforward_symmetric(
        n_features, n_features_out, dims=dims, funcs=tuple([func] * len(dims)), **kwargs
    )


# ------------------------------------------------------- LSTM factories
@register_model_builder(type="KerasLSTMAutoEncoder")
@register_model_builder(type="KerasLSTMForecast")
def lstm_model(
    n_features: int,
    n_features_out: int | None = None,
    lookback_window: int = 1,
    encoding_dim: tuple[int, ...] = (256, 128, 64),
    encoding_func: tuple[str, ...] = ("tanh", "tanh", "tanh"),
    decoding_dim: tuple[int, ...] = (64, 128, 256),
    decoding_func: tuple[str, ...] = ("tanh", "tanh", "tanh"),
    out_func: str = "linear",
    **kwargs,
) -> NumpyAutoEncoder:
    """lstm_autoencoder.py:17-103 layer-spec parity. Under the keras
    backend this builds the reference's real recurrent stack (LSTM
    cells over 3-D ``(lookback_window, n_features)`` windows); the
    numpy stand-in substitutes dense layers over the flattened lookback
    block, so ``n_features * lookback_window`` inputs feed its first
    layer."""
    n_features_out = n_features_out or n_features
    check_dim_func_len("encoding", encoding_dim, encoding_func)
    check_dim_func_len("decoding", decoding_dim, decoding_func)
    layers = [
        Layer(u, a, kind="lstm") for u, a in zip(encoding_dim, encoding_func)
    ] + [Layer(u, a, kind="lstm") for u, a in zip(decoding_dim, decoding_func)]
    layers.append(Layer(n_features_out, out_func))
    return _build_estimator(
        layers,
        n_features * lookback_window,
        lookback_window=lookback_window,
        **_train_kwargs(kwargs),
    )


@register_model_builder(type="KerasLSTMAutoEncoder")
@register_model_builder(type="KerasLSTMForecast")
def lstm_symmetric(
    n_features: int,
    n_features_out: int | None = None,
    lookback_window: int = 1,
    dims: tuple[int, ...] = (256, 128, 64),
    funcs: tuple[str, ...] = ("tanh", "tanh", "tanh"),
    **kwargs,
) -> NumpyAutoEncoder:
    """lstm_autoencoder.py:108-176 parity."""
    if len(dims) == 0:
        raise ValueError("Parameter dims must have len > 0")
    return lstm_model(
        n_features,
        n_features_out,
        lookback_window,
        encoding_dim=tuple(dims),
        decoding_dim=tuple(dims[::-1]),
        encoding_func=tuple(funcs),
        decoding_func=tuple(funcs[::-1]),
        **kwargs,
    )


@register_model_builder(type="KerasLSTMAutoEncoder")
@register_model_builder(type="KerasLSTMForecast")
def lstm_hourglass(
    n_features: int,
    n_features_out: int | None = None,
    lookback_window: int = 1,
    encoding_layers: int = 3,
    compression_factor: float = 0.5,
    func: str = "tanh",
    **kwargs,
) -> NumpyAutoEncoder:
    """lstm_autoencoder.py:179-263 parity — same hourglass dims as the
    feedforward doctests ([8, 7, 5, 5, 7, 8, 10] for n_features=10)."""
    dims = hourglass_calc_dims(compression_factor, encoding_layers, n_features)
    return lstm_symmetric(
        n_features,
        n_features_out,
        lookback_window,
        dims=dims,
        funcs=tuple([func] * len(dims)),
        **kwargs,
    )


def _train_kwargs(kwargs: dict) -> dict:
    """Split trainer knobs out of the factory kwargs (Keras' optimizer /
    compile kwargs have no numpy equivalent and are accepted-and-ignored,
    matching the reference's permissive ``**kwargs``). ``lookahead``
    rides along for the LSTM backend (the reference reads it off the
    estimator class — KerasLSTMAutoEncoder=0, KerasLSTMForecast=1,
    gordo/machine/model/models.py:700-711)."""
    return {
        k: kwargs[k]
        for k in ("lr", "epochs", "seed", "backend", "lookahead")
        if k in kwargs
    }


def timeseries_windows(
    X: np.ndarray,
    y: np.ndarray,
    lookback_window: int,
    lookahead: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Materialize the reference TimeseriesGenerator's (window, target)
    pairs as plain numpy tensors — the 3-D ``(n_samples, lookback,
    n_features)`` input the real LSTM stack consumes
    (gordo/machine/model/models.py:713-793 semantics, including the
    lookahead 0/1/>1 pad-truncate alignment):

    - ``lookahead == 0``: window ``X[i-L+1 .. i]`` targets ``y[i]`` (the
      generator post-pads X / pre-pads y by one row so the target lands
      on the window's LAST element) — ``len(X) - L + 1`` samples.
    - ``lookahead == 1``: window ``X[i-L .. i-1]`` targets ``y[i]`` (one
      step ahead) — ``len(X) - L`` samples.
    - ``lookahead == k > 1``: window targets ``y`` shifted ``k`` steps
      (the generator post-truncates X / pre-truncates y by ``k - 1``) —
      ``len(X) + 1 - k - L`` samples.

    Distributed twin: ``operators/align.lookback_windows`` computes the
    same (window, target) pairs as Spark array columns; this helper is
    the executor-side counterpart used inside the Keras adapter's fit.

    >>> X = np.arange(10.0).reshape(5, 2); y = X * 10
    >>> xb, yb = timeseries_windows(X, y, 2, 0)
    >>> xb.shape, yb.shape
    ((4, 2, 2), (4, 2))
    >>> xb[0].ravel().tolist(), yb[0].tolist()
    ([0.0, 1.0, 2.0, 3.0], [20.0, 30.0])
    >>> xb, yb = timeseries_windows(X, y, 2, 1)
    >>> xb.shape
    (3, 2, 2)
    >>> xb[0].ravel().tolist(), yb[0].tolist()
    ([0.0, 1.0, 2.0, 3.0], [40.0, 50.0])
    >>> xb, yb = timeseries_windows(X, y, 2, 2)
    >>> xb.shape
    (2, 2, 2)
    >>> xb[0].ravel().tolist(), yb[0].tolist()
    ([0.0, 1.0, 2.0, 3.0], [60.0, 70.0])
    """
    if lookahead < 0:
        raise ValueError(f"lookahead cannot be negative, got {lookahead}")
    L = int(lookback_window)
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if X.ndim == 1:
        X = X.reshape(len(X), 1)
    if y.ndim == 1:
        y = y.reshape(len(y), 1)
    if L >= len(X):
        raise ValueError("lookback_window must be < size of X")
    # the generator's pad/truncate alignment reduces to: window ending
    # at row e targets y[e + lookahead], windows kept while the target
    # exists — n = len(X) - L + 1 - lookahead samples
    n = len(X) - L + 1 - lookahead
    if n < 1:
        raise ValueError(
            f"no full (lookback={L}, lookahead={lookahead}) window fits "
            f"in {len(X)} rows"
        )
    xb = np.stack([X[s : s + L] for s in range(n)])
    yb = y[[s + L - 1 + lookahead for s in range(n)]]
    return xb, yb


# ------------------------------------------------- deep-model import gate
# Mirror of the multimodal PIL pattern (operators/multimodal.py): real
# TensorFlow/Keras when it imports, the deterministic numpy stand-in
# otherwise — so production parity is a pip install, not a rewrite. The
# contract/tests pin backend="numpy"; backend="auto" (the default)
# upgrades silently when tensorflow is present.
def tensorflow_available() -> bool:
    try:
        import tensorflow  # noqa: F401

        return True
    except Exception:
        return False


class KerasSequentialAdapter:
    """sklearn-style fit/predict over a compiled ``tf.keras.Sequential``
    built from the SAME ``Layer`` spec the numpy stand-in uses — the
    reference's real model path (gordo/machine/model/models.py:37-460
    compiles the factory's Sequential and fits with MSE). Only
    constructed when ``tensorflow`` imports.

    LSTM specs (any ``Layer(kind="lstm")``) build the reference's 3-D
    recurrent stack (gordo/machine/model/factories/lstm_autoencoder.py:
    17-103): input ``(lookback_window, n_features)``, every LSTM layer
    ``return_sequences=True`` except the last (the hand-off to the
    Dense head), then ``Dense(n_features_out, out_func)``. ``fit`` /
    ``predict`` take the house 2-D ``(n_samples, n_features)`` series
    and window it executor-side via :func:`timeseries_windows` — the
    TimeseriesGenerator semantics of models.py:713-793, ``lookahead``
    0 (autoencoder) / 1 (forecast) / >1 — so output rows are offset by
    ``lookback_window - 1 + lookahead`` exactly like the reference's
    KerasLSTMBaseEstimator (and our LaggedLinearModel)."""

    def __init__(
        self,
        layers: list[Layer],
        n_features: int,
        lr: float = 0.01,
        epochs: int = 50,
        seed: int = 0,
        lookback_window: int = 1,
        lookahead: int = 0,
    ):
        self.layers = list(layers)
        self.n_features = int(n_features)
        self.lr, self.epochs, self.seed = float(lr), int(epochs), int(seed)
        self.lookback_window = int(lookback_window)
        self.lookahead = int(lookahead)
        self.model_ = None

    @property
    def _is_lstm(self) -> bool:
        return any(l.kind == "lstm" for l in self.layers)

    def _build(self):
        import tensorflow as tf

        tf.keras.utils.set_random_seed(self.seed)
        if self._is_lstm:
            # self.n_features carries the flattened lookback block (the
            # numpy stand-in's input width); the recurrent stack wants
            # the per-timestep width back
            per_step = self.n_features // self.lookback_window
            keras_layers = [
                tf.keras.layers.Input((self.lookback_window, per_step))
            ]
            lstm_idx = [
                i for i, l in enumerate(self.layers) if l.kind == "lstm"
            ]
            for i, l in enumerate(self.layers):
                act = None if l.activation == "linear" else l.activation
                if l.kind == "lstm":
                    keras_layers.append(
                        tf.keras.layers.LSTM(
                            l.units,
                            activation=act,
                            return_sequences=i != lstm_idx[-1],
                        )
                    )
                else:
                    keras_layers.append(
                        tf.keras.layers.Dense(l.units, activation=act)
                    )
        else:
            keras_layers = [tf.keras.layers.Input((self.n_features,))]
            for l in self.layers:
                keras_layers.append(
                    tf.keras.layers.Dense(
                        l.units,
                        activation=None
                        if l.activation == "linear"
                        else l.activation,
                    )
                )
        model = tf.keras.Sequential(keras_layers)
        model.compile(
            optimizer=tf.keras.optimizers.Adam(self.lr), loss="mse"
        )
        return model

    def fit(self, X, y=None) -> "KerasSequentialAdapter":
        X = np.asarray(X, dtype=np.float64)
        target = X if y is None else np.asarray(y, dtype=np.float64)
        self.model_ = self._build()
        if self._is_lstm:
            X, target = timeseries_windows(
                X, target, self.lookback_window, self.lookahead
            )
        self.model_.fit(X, target, epochs=self.epochs, verbose=0)
        return self

    def predict(self, X) -> np.ndarray:
        if self.model_ is None:
            raise ValueError("estimator is not fitted")
        X = np.asarray(X, dtype=np.float64)
        if self._is_lstm:
            X, _ = timeseries_windows(
                X, X, self.lookback_window, self.lookahead
            )
        return np.asarray(self.model_.predict(X, verbose=0))


def _build_estimator(
    layers: list[Layer],
    n_features: int,
    backend: str = "auto",
    lookback_window: int = 1,
    **train,
):
    """Backend dispatch for every factory: ``auto`` = keras when
    importable else numpy; ``numpy`` / ``keras`` force a branch (keras
    raises ImportError when tensorflow is absent, so a config that
    demands the real model fails loudly rather than silently degrading).

    ``n_features`` is the FLATTENED input width (per-step features x
    lookback for the LSTM family — the numpy stand-in's convention);
    the keras LSTM path recovers the 3-D shape from
    ``lookback_window``. ``lookahead`` (in ``train``) only applies to
    the keras LSTM fit windowing; the numpy stand-in takes
    caller-windowed rows, so it is dropped there."""
    if backend == "auto":
        backend = "keras" if tensorflow_available() else "numpy"
    if backend == "keras":
        if not tensorflow_available():
            raise ImportError(
                "backend='keras' requires tensorflow; install it or use "
                "backend='numpy' (the deterministic stand-in)"
            )
        return KerasSequentialAdapter(
            layers, n_features, lookback_window=lookback_window, **train
        )
    if backend != "numpy":
        raise ValueError(f"unknown backend {backend!r} (auto|keras|numpy)")
    train.pop("lookahead", None)
    return NumpyAutoEncoder(layers, n_features, **train)


# ------------------------------------- estimator for PythonEstimatorModel
class AutoEncoderEstimator:
    """sklearn-style wrapper that builds the registered architecture at fit
    time from ``X.shape[1]`` — the reference's ``KerasAutoEncoder(kind=...)``
    shape (gordo/machine/model/models.py: builds via
    ``register_model_builder.factories[self.__class__.__name__][kind]``).

    Usable directly or through ``PythonEstimatorModel`` with
    ``estimator="gordo_spark.ml.factories.AutoEncoderEstimator"`` — which is
    how a machine config declares the autoencoder today, and how a real
    Keras estimator would plug in.
    """

    def __init__(self, kind: str = "feedforward_hourglass", type: str = "KerasAutoEncoder", **factory_kwargs):
        try:
            self._builder = register_model_builder.factories[type][kind]
        except KeyError:
            raise ValueError(
                f"unknown model builder type={type!r} kind={kind!r}; registered: "
                f"{ {t: sorted(ks) for t, ks in register_model_builder.factories.items()} }"
            ) from None
        self.kind = kind
        self.type = type
        self.factory_kwargs = dict(factory_kwargs)
        self.model_: NumpyAutoEncoder | None = None

    def fit(self, X: np.ndarray, y: np.ndarray | None = None) -> "AutoEncoderEstimator":
        X = np.asarray(X, dtype=np.float64)
        n_features_out = None
        if y is not None:
            y = np.asarray(y, dtype=np.float64)
            n_features_out = y.shape[1] if y.ndim > 1 else 1
        self.model_ = self._builder(
            X.shape[1], n_features_out=n_features_out, **self.factory_kwargs
        )
        self.model_.fit(X, y)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        if self.model_ is None:
            raise ValueError("estimator is not fitted")
        return self.model_.predict(X)
