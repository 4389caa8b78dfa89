class ConstructorRegistry:
    def __init__(self, *a, **k):
        pass

    def primitive_rule(self, fn=None, **k):
        if fn is None:
            return lambda f: f
        return fn

    def define_rule(self, *a, **k):
        return lambda f: f


class PrimitiveConstructorSpec:
    def __init__(self, *a, **k):
        pass

    def __class_getitem__(cls, item):
        return cls


class PrimitiveTypeInfo:
    pass
