from maunet_tpu.ops.pallas.lstm import lstm_last_hidden  # noqa: F401
