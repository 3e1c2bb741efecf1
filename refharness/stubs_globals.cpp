// Zero-filled stand-ins for gigablast's global singletons. The harness
// never exercises code paths that read meaningful state from these; the
// parser chain (Xml/XmlNode/Entities/fctypes/Unicode) only touches them
// through the no-op method stubs in stubs_methods.cpp. Deliberately no
// reference headers here: C++ global variables link by unmangled name,
// so opaque blobs satisfy the references without dragging in the
// constructors of Conf/Hostdb/Loop/Threads/Mem.
#include <cstdint>

extern "C" {
// sized generously past sizeof() of the real classes; BSS, zero-filled
alignas(64) unsigned char g_conf[1 << 22];
alignas(64) unsigned char g_hostdb[1 << 20];
alignas(64) unsigned char g_loop[1 << 20];
alignas(64) unsigned char g_threads[1 << 20];
alignas(64) unsigned char g_mem[1 << 20];
}

int g_errno = 0;
int64_t g_now = 0;
int32_t g_niceness = 0;
bool g_inSigHandler = false;
