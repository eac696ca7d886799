def discretediag(*a, **k):
    raise NotImplementedError
