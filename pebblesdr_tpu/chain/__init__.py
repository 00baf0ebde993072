from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig, RxParams  # noqa: F401
