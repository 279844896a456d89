package graft.fls;

import java.lang.invoke.MethodHandles;
import java.lang.invoke.VarHandle;
import java.nio.ByteOrder;

/**
 * Little-endian primitive loads from byte arrays via VarHandle views —
 * the JIT compiles each to a single (unaligned) memory load, where a
 * byte-at-a-time assembly loop costs ~8 loads + 7 shift/ors. Java source
 * because scalac cannot emit polymorphic-signature VarHandle calls
 * without boxing.
 */
public final class BitsLE {
    private static final VarHandle LONGS =
        MethodHandles.byteArrayViewVarHandle(long[].class, ByteOrder.LITTLE_ENDIAN);
    private static final VarHandle INTS =
        MethodHandles.byteArrayViewVarHandle(int[].class, ByteOrder.LITTLE_ENDIAN);

    private BitsLE() {}

    public static long getLong(byte[] buf, int off) {
        return (long) LONGS.get(buf, off);
    }

    public static int getInt(byte[] buf, int off) {
        return (int) INTS.get(buf, off);
    }
}
