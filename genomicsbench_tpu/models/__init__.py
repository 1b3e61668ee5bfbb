"""Neural models: CTC basecaller (nn-base) and BiLSTM variant caller (nn-variant)."""
