from .lstm_gates import fused_lstm_gates, lstm_gates_reference

__all__ = ["fused_lstm_gates", "lstm_gates_reference"]
